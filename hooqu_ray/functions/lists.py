"""List-column (nested-type) operators.

The reference operates on flat pandas frames only (SURVEY §2: no nested
types); a training-data pipeline meets ``list<T>`` columns constantly —
embeddings, token ids, tool-call arrays.  ``explode`` is the SQL
``UNNEST ... WITH ORDINALITY`` equivalent (this sandbox's DuckDB spells it
``UNNEST(xs) + generate_subscripts(xs, 1)``), expressed as one
embarrassingly-parallel ``map_batches`` stage: no shuffle, no Python per
row — parent indices and per-element positions come from the Arrow list
offsets via ``pc.list_parent_indices`` + one vectorized run-length
subtraction.

Scale notes: output rows = total element count, so a block of B rows with
average list length L emits B·L rows — Ray's streaming executor re-blocks
downstream, but pick upstream ``batch_size`` so B·L element payloads fit a
worker heap (the flagship multimodal stages document the same rule).
Null and empty lists emit nothing, matching SQL ``UNNEST`` exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_list_array(col) -> pa.Array:
    """Normalize chunked / fixed-size-list columns to one ListArray."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
    if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
        raise TypeError(f"explode: column is not a list type (got {col.type})")
    return col


def _positions(parent: np.ndarray) -> np.ndarray:
    """0-based position of each element within its parent list, from the
    (sorted, contiguous) parent-index array — one run-length subtraction."""
    n = len(parent)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.r_[0, np.flatnonzero(parent[1:] != parent[:-1]) + 1]
    counts = np.diff(np.r_[starts, n])
    return np.arange(n, dtype=np.int64) - np.repeat(starts, counts)


def explode(ds, list_col: str, keep_cols: Sequence[str],
            value_col: str = "el", pos_col: Optional[str] = "pos",
            base: int = 0):
    """One output row per list ELEMENT: ``keep_cols`` replicated per
    element, the element itself as ``value_col`` and (optionally) its
    ``base``-based position as ``pos_col`` — SQL ``UNNEST ... WITH
    ORDINALITY`` over a Ray Dataset.  Null/empty lists emit no rows."""
    keep_cols = list(keep_cols)

    def explode_block(t: pa.Table) -> pa.Table:
        arr = _as_list_array(t.column(list_col))
        flat = pc.list_flatten(arr)
        parent = pc.list_parent_indices(arr)
        pidx = parent.to_numpy(zero_copy_only=False)
        cols = {c: t.column(c).take(parent) for c in keep_cols}
        if pos_col is not None:
            cols[pos_col] = pa.array(_positions(pidx) + base, pa.int64())
        cols[value_col] = flat
        return pa.table(cols)

    return ds.map_batches(explode_block, batch_format="pyarrow")
