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
        # fit; pay the keyed exchange instead (partials already shrank the
        # input as far as per-block combining can)
        from ray.data.aggregate import Max, Min, Sum

        aggs = [{"sum": Sum, "min": Min, "max": Max}[f](c)
                for c, f in zip(sum_cols, funcs)]
        exchange = partials
        null_part = None
        if not drop_null_keys:
            # Ray's sort-based groupby cannot range-partition null keys
            # (None-vs-value comparisons crash in its sort); split the
            # null-key partial rows out and tree-fold them separately —
            # they are at most one group per null-key combination
            def any_null(t: pa.Table, invert: bool) -> pa.Table:
                if len(t) == 0 or keys[0] not in t.column_names:
                    return t
                mask = pc.is_valid(t.column(keys[0]))
                for k in keys[1:]:
                    mask = pc.and_(mask, pc.is_valid(t.column(k)))
                return t.filter(mask if not invert else pc.invert(mask))

            null_rows = partials.map_batches(
                lambda t: any_null(t, invert=True),
                batch_format="pyarrow").materialize()
            # bound by DISTINCT null-key combinations, not pre-fold
            # partial rows (which scale with #blocks): _tree_fold checks
            # the combined row count before its final single-block round
            null_part = _tree_fold(null_rows, combine, fanin,
                                   max_final_rows=max_fold_rows)
            exchange = partials.map_batches(
                lambda t: any_null(t, invert=False), batch_format="pyarrow")

        folded = exchange.groupby(keys).aggregate(*aggs)

        def rename(t: pa.Table) -> pa.Table:
            want = {f"{f}({c})": c for c, f in zip(sum_cols, funcs)}
            if not set(want).issubset(t.column_names):
                return pa.table({})
            return t.rename_columns(
                [want.get(c, c) for c in t.column_names]).select(
                keys + sum_cols)

        out = folded.map_batches(rename, batch_format="pyarrow")
        if null_part is not None:
            out = out.union(null_part)
        return out.materialize()

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
