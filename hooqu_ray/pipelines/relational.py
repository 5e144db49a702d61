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
                  tie_col: str, extra_cols=()):
    """Top-k rows per group by ``order_col`` DESC (ties broken by ascending
    ``tie_col``) — the ``row_number() OVER (PARTITION BY ... ORDER BY ...)``
    shape.

    Per-block combiner: each block reduces to its LOCAL top-k per group
    (vectorized pandas sort + grouped head), so at most
    ``#blocks × #groups × k`` tiny rows leave the scan; the final merge is
    one driver-side pandas pass over those partials.  Returns an Arrow table
    sorted by (group, rank order).  Assumes the group-count × k result fits
    the driver — for million-group tails use a groupby over the partials
    instead."""
    cols = [group_col, order_col, tie_col, *extra_cols]
    # dict keeps order, drops duplicates (e.g. tie_col listed in extra_cols)
    cols = list(dict.fromkeys(cols))

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = df.sort_values(
            [group_col, order_col, tie_col],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k), preserve_index=False
        )

    partials = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None)
    from ..util import collect_arrow

    collected = collect_arrow(partials)
    if collected is None:
        return pa.table({c: pa.array([]) for c in cols})
    merged = collected.to_pandas()
    merged = merged.sort_values(
        [group_col, order_col, tie_col],
        ascending=[True, False, True],
        kind="mergesort",
        ignore_index=True,
    )
    top = merged.groupby(group_col, sort=False).head(k)
    return pa.Table.from_pandas(top, preserve_index=False)


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
