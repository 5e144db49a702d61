"""Relational helpers a reference user would reach for next: grouped top-k
and deterministic (SQL-reproducible) hash sampling.

Both are combiner-first: the per-block stage shrinks the data to a bounded
partial result before anything crosses the wire, so neither operator ever
shuffles the full input.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_top_k(ds, group_col: str, order_col: str, k: int,
                  tie_col: str, extra_cols=(), driver_max_rows: int = 2_000_000):
    """Top-k rows per group by ``order_col`` DESC (ties broken by ascending
    ``tie_col``) — the ``row_number() OVER (PARTITION BY ... ORDER BY ...)``
    shape.

    Per-block combiner: each block reduces to its LOCAL top-k per group
    (vectorized pandas sort + grouped head), so at most
    ``#blocks × #groups × k`` tiny rows leave the scan.  When the partials
    fit under ``driver_max_rows`` the final merge is one driver-side pandas
    pass (returns an Arrow table sorted by (group, rank order)).  Above the
    gate — the million-group tail — the merge stays DISTRIBUTED: one range
    sort of the partials + a vectorized per-block head-k for interior
    groups + a tiny boundary merge touching at most the first/last group of
    each block (the sessionization pattern), returning a Ray Dataset the
    driver never materializes."""
    cols = [group_col, order_col, tie_col, *extra_cols]
    # dict keeps order, drops duplicates (e.g. tie_col listed in extra_cols)
    cols = list(dict.fromkeys(cols))
    sort_cols = [group_col, order_col, tie_col]
    ascending = [True, False, True]

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = df.sort_values(
            sort_cols, ascending=ascending, kind="mergesort", ignore_index=True
        )
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k), preserve_index=False
        )

    partials = ds.map_batches(
        block_topk, batch_format="pyarrow", batch_size=None
    ).materialize()  # partials are combiner-bounded; count() is then free
    if partials.count() <= driver_max_rows:
        from ..util import collect_arrow

        collected = collect_arrow(partials)
        if collected is None:
            return pa.table({c: pa.array([]) for c in cols})
        merged = collected.to_pandas()
        merged = merged.sort_values(
            sort_cols, ascending=ascending, kind="mergesort", ignore_index=True
        )
        top = merged.groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(top, preserve_index=False)
    return _distributed_topk_merge(
        partials, group_col, sort_cols, ascending, k, cols
    )


def _distributed_topk_merge(partials, group_col, sort_cols, ascending, k, cols):
    """Range-sort the combiner partials, finish interior groups vectorized
    per block, and repair only each block's first/last group through a
    ≤ 2-groups-per-block ``groupby().map_groups`` — #groups × k result rows
    stay distributed."""
    import pandas as pd

    def split_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__pending", pa.array([], pa.bool_()))
        df = t.to_pandas()  # block is already (group, order, tie)-sorted
        g = df[group_col].to_numpy()
        pending = (g == g[0]) | (g == g[-1])
        keep = pending.copy()
        interior_top = (
            df[~pending].groupby(group_col, sort=False).head(k).index.to_numpy()
        )
        keep[interior_top] = True
        out = df[keep]
        return pa.Table.from_pandas(
            out.assign(__pending=pending[keep]), preserve_index=False
        )

    marked = partials.sort(sort_cols, descending=[not a for a in ascending]) \
        .map_batches(split_block, batch_format="pyarrow", batch_size=None) \
        .materialize()  # consumed twice below; ≤ #groups×k + boundary rows

    interior = marked.map_batches(
        lambda t, _c=cols: t.filter(pc.invert(t.column("__pending"))).select(_c),
        batch_format="pyarrow",
    )

    def merge_group(grp):
        grp = grp.sort_values(
            sort_cols, ascending=ascending, kind="mergesort", ignore_index=True
        )
        return grp.head(k)[cols]

    boundary = marked.map_batches(
        lambda t, _c=cols: t.filter(t.column("__pending")).select(_c),
        batch_format="pyarrow",
    )
    merged = boundary.groupby(group_col).map_groups(
        lambda g, _m=merge_group: _m(g), batch_format="pandas"
    )
    return interior.union(merged)


_HEX_MAX8 = 8


def md5_bucket(values) -> np.ndarray:
    """Deterministic 32-bit bucket value per row: the first 8 hex digits of
    ``md5(str(value))`` as an integer — chosen because DuckDB reproduces it
    exactly (``CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1, 8)) AS
    BIGINT)``), which makes hash sampling SQL-oracle-checkable.  md5 has no
    Arrow kernel, so this is a per-row hashlib call — fine for a sampling
    DECISION column (~1 µs/row); it is not a text-volume hot path."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values.to_pylist()):
        out[i] = int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:_HEX_MAX8], 16)
    return out


def hash_sample(ds, col: str, buckets: int = 20, keep_bucket: int = 0):
    """Deterministic ~(1/buckets) sample: keep rows whose md5 bucket of
    ``col`` satisfies ``bucket % buckets == keep_bucket``.  Stable across
    runs, processes and engines (same rows every time — resumable pipelines
    can re-derive the sample), and exactly reproducible in SQL."""
    def keep(t: pa.Table) -> pa.Table:
        b = md5_bucket(t.column(col))
        return t.filter(pa.array(b % buckets == keep_bucket))

    return ds.map_batches(keep, batch_format="pyarrow")
