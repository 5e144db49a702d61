"""Skew-aware shuffle helpers.

A ``groupby(key)`` hash shuffle sends every row of a hot key to ONE reducer;
a handful of million-turn conversations would straggle the whole wave.  Two
standard remedies, both implemented here:

- **Salted partial aggregation** (for mergeable per-group reductions):
  rows group by ``(key, salt)`` with ``salt = hash(row) % buckets`` so a hot
  key's rows spread over ``buckets`` reducers; the per-(key, salt) partials
  are tiny and a second, skew-free pass merges them per key.  This is the
  generalization of the transcript pipeline's per-block pre-aggregation.
- **Sequence groups with a size guard** (for order-dependent per-group
  logic that genuinely needs every row of a group together, e.g. turn-order
  checks): group sizes are bounded by a cap; oversized groups are flagged
  rather than materialized, so one pathological conversation cannot OOM a
  reducer.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _AddSalt:
    def __init__(self, key: str, buckets: int):
        self.key = key
        self.buckets = buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        # cheap deterministic row salt: row position within block mod buckets
        # spreads a hot key's rows evenly regardless of its hash
        salt = np.arange(len(batch), dtype=np.int32) % self.buckets
        return batch.append_column("__salt", pa.array(salt, pa.int32()))


def salted_group_aggregate(
    ds,
    key: str,
    agg_columns: Sequence[str],
    buckets: int = 16,
):
    """Skew-safe ``groupby(key).sum(agg_columns)``.

    Pass 1 groups by (key, __salt) — a hot key fans out over ``buckets``
    reducers; pass 2 groups the (much smaller) partials by key alone.
    Returns a Dataset with columns ``key`` + ``sum(col)`` per agg column."""
    from ray.data.aggregate import Sum

    salted = ds.map_batches(_AddSalt(key, buckets), batch_format="pyarrow")
    partial = salted.groupby([key, "__salt"]).aggregate(
        *[Sum(c) for c in agg_columns]
    )
    final = partial.groupby(key).aggregate(
        *[Sum(f"sum({c})") for c in agg_columns]
    )

    def rename(batch: pa.Table) -> pa.Table:
        names = []
        for n in batch.column_names:
            # sum(sum(x)) -> sum(x)
            names.append(n[4:-1] if n.startswith("sum(sum(") else n)
        return batch.rename_columns(names)

    return final.map_batches(rename, batch_format="pyarrow")


class _BoundedGroupApply:
    def __init__(self, fn: Callable, order_by: Optional[str], max_rows: int):
        self.fn = fn
        self.order_by = order_by
        self.max_rows = max_rows

    def __call__(self, group):
        import pandas as pd

        if len(group) > self.max_rows:
            # refuse to materialize a pathological group; surface it instead
            return pd.DataFrame(
                {
                    "__oversized_group": [True],
                    "__group_rows": [len(group)],
                }
            )
        if self.order_by is not None:
            group = group.sort_values(self.order_by, ignore_index=True)
        return self.fn(group)


def grouped_sequence_apply(
    ds,
    key: str,
    fn: Callable,
    order_by: Optional[str] = None,
    max_group_rows: int = 1_000_000,
):
    """Per-group ordered apply with an OOM guard: ``fn`` receives each
    group's rows as a pandas frame sorted by ``order_by``.  Groups larger
    than ``max_group_rows`` yield a flag row instead of being processed
    (downstream decides: drop, split, or handle specially)."""
    bounded = _BoundedGroupApply(fn, order_by, max_group_rows)
    return ds.groupby(key).map_groups(
        lambda g, _b=bounded: _b(g), batch_format="pandas"
    )


def _tree_combine_factory(keys: Sequence[str], agg_cols: Sequence[str],
                          funcs: Sequence[str], drop_null_keys: bool):
    """Per-block ``group_by(keys).aggregate`` that preserves the input
    column names and order (pyarrow emits keys first, then ``{col}_{fn}``).
    ``drop_null_keys`` filters null-key rows before grouping; Arrow's
    ``group_by`` otherwise keeps null as its own group (SQL GROUP BY /
    Ray-groupby parity)."""
    keys = list(keys)
    agg_cols = list(agg_cols)
    proj = keys + agg_cols
    spec = [(c, f) for c, f in zip(agg_cols, funcs)]

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0 or not set(proj).issubset(t.column_names):
            # schema-less empty aggregate block — emit nothing; the caller
            # anchors the output schema
            return pa.table({})
        t = t.select(proj)
        if drop_null_keys:
            mask = pc.is_valid(t.column(keys[0]))
            for k in keys[1:]:
                mask = pc.and_(mask, pc.is_valid(t.column(k)))
            t = t.filter(mask)
        return t.group_by(keys).aggregate(spec).rename_columns(proj)

    return combine


def _row_hash64(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Deterministic uint64 hash of each row's key TUPLE, identical across
    Ray workers (polars ``hash_rows`` at a fixed seed is process-stable for
    a fixed polars version — the same contract ``dedup._text_hash63``
    already relies on cross-block; builtin ``hash`` is PYTHONHASHSEED-random
    per worker and must never be used here).  Nulls hash stably, so null
    keys ride the exchange like any other group."""
    sub = t.select(list(keys)).combine_chunks()
    if len(sub) == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        import polars as pl

        return pl.from_arrow(sub).hash_rows(seed=0).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover - slow deterministic fallback
        import hashlib

        parts = [pc.cast(sub.column(k), pa.string()).to_pylist() for k in keys]
        out = np.empty(len(sub), dtype=np.uint64)
        for i, vals in enumerate(zip(*parts)):
            payload = "\x1f".join("\x00" if v is None else v for v in vals)
            out[i] = int.from_bytes(
                hashlib.blake2b(payload.encode("utf-8"), digest_size=8).digest(),
                "little")
        return out


class _StampBucket:
    """Project a block to ``keys + cols`` and stamp ``__bh = hash64(keys)
    % num_buckets`` (int32).  Degenerate blocks (schema-less empty
    aggregates that lack the key columns) emit a typed empty table so the
    exchange never sees mixed schemas."""

    def __init__(self, keys, cols, num_buckets, empty: pa.Table):
        self.proj = list(keys) + list(cols)
        self.keys = list(keys)
        self.num_buckets = num_buckets
        self.empty = empty

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0 or not set(self.proj).issubset(t.column_names):
            return self.empty
        t = t.select(self.proj)
        b = (_row_hash64(t, self.keys) % np.uint64(self.num_buckets)).astype(
            np.int32)
        return t.append_column("__bh", pa.array(b, pa.int32()))


def bucketed_group_fold(ds, keys, cols, funcs: Optional[Sequence[str]] = None,
                        *, drop_null_keys: bool = False,
                        num_buckets: Optional[int] = None,
                        finalize: Optional[Callable[[pa.Table], pa.Table]] = None,
                        combine: Optional[Callable[[pa.Table], pa.Table]] = None,
                        rows_per_bucket: int = 250_000):
    """Corpus-cardinality ``groupby(keys).agg(cols)`` via a BUCKETED hash
    exchange — the replacement for Ray's sort-based groupby when the key
    count scales with the corpus (near-unique ids, content hashes).

    Ray's ``groupby(keys).aggregate(...)`` pays a per-GROUP Python cost in
    its reduce tasks (~5 µs/row when keys are near-unique — CLAUDE.md
    gotcha; the hash-shuffle strategy measured no faster).  Here the
    exchange key is ``__bh = hash64(key tuple) % B`` — a SMALL int32 with
    ``B`` ≈ #CPUs..4096 distinct values — so the sort/exchange is over a
    machine int and the reduce side sees ``B`` groups, not millions; each
    bucket then folds with ONE vectorized Arrow ``group_by``.  Rows of a
    key always share a bucket (hash is cross-worker deterministic), buckets
    partition the key space disjointly, so per-bucket folds are exact and
    independent.  Measured at 3.2M rows / 600k string keys / 32 CPUs:
    10.2× vs the sort-based groupby on per-block pre-combined partials
    (21.1 s → 2.1 s) and 157× on raw uncombined rows (365 s → 2.3 s);
    see BASELINE.md.

    At 100 TB: ``B`` grows with the partial row count (``rows_per_bucket``)
    up to 4096, each bucket is a bounded independent task, and only slim
    ``keys + cols`` rows ride the exchange (payload columns are projected
    away before the shuffle).  Skew note: one bucket holds ~1/B of the KEY
    SPACE, not of the rows — a single mega-HOT key still lands in one
    bucket, so callers with row-skewed keys must pre-combine per block
    first (``_ProjectKeys`` / ``_tree_combine_factory`` pattern), after
    which a hot key contributes ≤ #blocks rows.

    ``funcs`` are the self-mergeable "sum"/"min"/"max" (inputs may already
    be per-block partials).  ``drop_null_keys=False`` (default) keeps null
    keys as their own group (SQL/Arrow parity); True drops them.
    ``finalize`` (optional) maps each bucket's FOLDED table (columns
    ``keys + cols``, one row per key) to an arbitrary summary table —
    frequency reductions use it to emit one scalar-summary row per bucket
    so the folded table itself never re-shuffles.  ``combine`` (optional)
    replaces the column-wise ``funcs`` fold with a custom self-mergeable
    per-bucket reduction over ``keys + cols`` (e.g. the first/last
    lexicographic selection of ``windows.grouped_first_last``); ``funcs``
    and ``drop_null_keys`` are then ignored — the callable owns its own
    semantics, including the empty/degenerate-block guard.  Returns an
    unmaterialized Dataset of the per-bucket outputs."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = list(cols)
    funcs = list(funcs) if funcs is not None else ["sum"] * len(cols)
    if combine is None:
        combine = _tree_combine_factory(keys, cols, funcs, drop_null_keys)

    ds = ds.materialize()  # need row/block counts to size the exchange
    n = ds.count()
    from ..util import dataset_arrow_schema

    schema = dataset_arrow_schema(ds)
    proj = keys + cols
    if schema is None or not set(proj).issubset(schema.names):
        # no typed block anywhere holds the key columns — nothing to fold
        import ray.data as rd

        out = combine(pa.table({}))
        return rd.from_arrow(finalize(out) if finalize is not None else out)
    empty = pa.schema([schema.field(c) for c in proj]).empty_table()
    empty = empty.append_column("__bh", pa.array([], pa.int32()))

    if num_buckets is None:
        num_buckets = _default_buckets(n, rows_per_bucket)
    stamped = ds.map_batches(_StampBucket(keys, cols, num_buckets, empty),
                             batch_format="pyarrow")
    # Ray's sort-based exchange inherits reduce parallelism from the input
    # block count: a near-single-block input would serialize every bucket
    # into one task (CLAUDE.md gotcha) — spread it first.
    target_blocks = min(num_buckets, _cluster_cpus() * 2)
    if n > 65_536 and ds.num_blocks() < target_blocks:
        stamped = stamped.repartition(target_blocks)

    def per_bucket(t: pa.Table) -> pa.Table:
        folded = combine(t.drop_columns(["__bh"]))
        return finalize(folded) if finalize is not None else folded

    return stamped.groupby("__bh").map_groups(
        lambda t: per_bucket(t), batch_format="pyarrow")


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:  # pragma: no cover
        pass
    return 4


def _default_buckets(n_rows: int, rows_per_bucket: int) -> int:
    """#buckets: enough for cluster parallelism, growing with the partial
    row count so one bucket's fold stays a bounded task, capped at 4096
    (beyond that per-group scheduling overhead dominates)."""
    return int(min(4096, max(_cluster_cpus(), 16,
                             -(-n_rows // max(1, rows_per_bucket)))))


def tree_group_sum(ds, keys, sum_cols, *, funcs: Optional[Sequence[str]] = None,
                   max_fold_rows: int = 4_000_000, fanin: int = 8,
                   drop_null_keys: bool = True):
    """``groupby(keys).sum(sum_cols)`` with NO key exchange: per-block
    Arrow combine, then log-depth coalesce-and-combine rounds
    (``repartition(n // fanin)`` moves whole blocks, never keyed rows)
    until one block holds every distinct key.  Measured ~20× faster than
    the sort-based ``Dataset.groupby`` at 3.2M rows / 30k keys on 32 CPUs.

    VALID ONLY when the distinct-key count fits one block: after the first
    combine the partials are counted, and if they still exceed
    ``max_fold_rows`` × ``fanin`` (combining did not shrink — unbounded
    key cardinality) the partials fall back to the sort-based
    ``groupby`` exchange, so at 100 TB a near-unique key degrades
    gracefully instead of OOMing the final fold task.

    ``funcs`` generalizes to per-column "sum"/"min"/"max" (algebraic,
    self-mergeable — a min of mins is the min).  ``drop_null_keys=True``
    (default) drops null-key rows — NOTE this is a deliberate divergence
    from Ray's ``groupby``, which (like SQL GROUP BY and Arrow's
    ``group_by``) KEEPS null as its own group; it matches the engine's
    grouped ops, whose call sites pre-filter null keys anyway.  Pass
    ``drop_null_keys=False`` for SQL GROUP BY parity — both the tree and
    the fallback path then keep the null group.  Output columns keep
    their INPUT names, one row per distinct key, in no particular order.
    Returns a (small) materialized Dataset."""
    keys = list(keys) if not isinstance(keys, str) else [keys]
    sum_cols = list(sum_cols)
    funcs = list(funcs) if funcs is not None else ["sum"] * len(sum_cols)
    if len(funcs) != len(sum_cols):
        raise ValueError("funcs must match sum_cols")
    if any(f not in ("sum", "min", "max") for f in funcs):
        raise ValueError(f"unsupported tree aggregate in {funcs}: only "
                         "self-mergeable sum/min/max fold through a tree")
    combine = _tree_combine_factory(keys, sum_cols, funcs, drop_null_keys)

    partials = ds.map_batches(combine, batch_format="pyarrow").materialize()
    n = partials.count()
    if n > max_fold_rows * fanin:
        # key cardinality is corpus-like — the tree's final block would not
        # fit; fold through the bucketed hash exchange instead (partials
        # already shrank the input as far as per-block combining can;
        # measured ~10× over the old sort-based groupby arm).  Null keys in
        # drop_null_keys=False parity mode ride the exchange natively: the
        # sort key is the int32 bucket, never the key columns, so the old
        # null-split workaround for Ray's None-vs-value sort crash is gone.
        return bucketed_group_fold(
            partials, keys, sum_cols, funcs,
            drop_null_keys=drop_null_keys).materialize()

    return _tree_fold(partials, combine, fanin)


def _tree_fold(partials, combine, fanin: int,
               max_final_rows: Optional[int] = None):
    """Coalesce-and-combine a MATERIALIZED partials dataset down to one
    block (repartition moves whole blocks, never keyed rows).  With
    ``max_final_rows``, refuse to build the final single block when the
    combined rows — the distinct key count — exceed the bound."""
    nblocks = partials.num_blocks()
    while nblocks > 1:
        # min(nblocks - 1, ...) forces progress for any fanin (fanin=1
        # would otherwise loop on nblocks // 1 == nblocks forever)
        nblocks = max(1, min(nblocks - 1, nblocks // fanin))
        if (nblocks == 1 and max_final_rows is not None
                and partials.count() > max_final_rows):
            raise ValueError(
                "tree fold: distinct key combinations exceed the final "
                "fold bound — pre-split or pre-aggregate upstream")
        partials = (partials.repartition(nblocks)
                    .map_batches(combine, batch_format="pyarrow")
                    .materialize())
    return partials


def tree_distinct(ds, cols, *, max_fold_rows: int = 4_000_000,
                  fanin: int = 8):
    """DISTINCT ``cols`` tuples via the tree fold: per-block Arrow
    ``group_by(cols)`` dedupe, coalesce-and-combine rounds, adaptive
    sort-shuffle fallback — the shared helper behind the "distinct set +
    ones column" pattern (connected-components node init, pivot column
    scan, document frequency).  Null-key tuples drop (the grouped-op
    convention).  Returns a materialized Dataset with exactly ``cols``."""
    cols = list(cols) if not isinstance(cols, str) else [cols]

    def ones(t: pa.Table) -> pa.Table:
        if len(t) == 0 or not set(cols).issubset(t.column_names):
            return pa.table({})
        sub = t.select(cols)
        return sub.append_column(
            "__one", pa.array(np.ones(len(sub), np.int64)))

    out = tree_group_sum(ds.map_batches(ones, batch_format="pyarrow"),
                         cols, ["__one"],
                         max_fold_rows=max_fold_rows, fanin=fanin)
    return out.map_batches(
        lambda t: (t.drop_columns(["__one"]) if "__one" in t.column_names
                   else t),
        batch_format="pyarrow")
