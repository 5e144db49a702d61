"""Per-key rolling-window aggregate (``AVG(x) OVER (PARTITION BY key ORDER
BY ts, tie ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``), Ray-Data-first.

The reference has no window surface (SURVEY §2.3 "Streaming: nothing");
rolling features (trailing activity averages, smoothed quality scores) are
a staple of event-log and training-data pipelines.  Same sort-based
discipline as ``sessions.py``/``asof.py``: ONE distributed range
``sort(key, ts, tie)`` over a slim projection, then a fully vectorized
per-block padded-cumsum pass — zero Python per row.

Boundary repair: after a range sort only a block's FIRST key can continue
from an earlier block, so only its first ``w−1`` rows can have windows
reaching back across the boundary; they are re-computed in a tiny
``groupby(key)`` merge fed by ≤ ``w−1`` context rows per block (the last
``w−1`` rows of each block's LAST key).  Every in-window predecessor of a
pending row is present in its merge group: in-block predecessors of a
pending row are themselves pending (they sit even earlier in the first
``w−1`` rows), and cross-block predecessors are inside the previous
blocks' ``w−1``-row tails — so the group-local window equals the global
one.  Nothing is broadcast and the one all-to-all is the range sort.

Null semantics match SQL: null values don't contribute to the window
(``AVG`` skips them; an all-null window yields null); rows with a null key
or timestamp are dropped (see ``asof.py`` for the rationale).  ``tie``
must be unique per key (it is the deterministic order tie-break — use a
row id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rolling_block(t: pa.Table, key: str, value_col: str, w: int,
                   out_col: str, emit: str) -> pa.Table:
    """One vectorized pass over a (key, ts, tie)-sorted block.

    ``emit='finals'``: rows whose window is complete in-block, with the
    rolling mean attached.  ``emit='pendctx'``: the boundary set — pending
    first-key head rows (``__emit`` true) plus the last ``w−1`` rows of the
    block's last key as context (``__emit`` false)."""
    n = len(t)
    if n == 0:
        if emit == "finals":
            return t.drop_columns([value_col]).append_column(
                out_col, pa.array([], pa.float64())
            )
        return t.append_column("__emit", pa.array([], pa.bool_()))
    keys = t.column(key).to_numpy(zero_copy_only=False)
    arange = np.arange(n, dtype=np.int64)
    pending = (keys == keys[0]) & (arange < w - 1)

    if emit == "pendctx":
        mask = pending.copy()
        ctx = np.flatnonzero(keys == keys[-1])[-(w - 1):] if w > 1 else []
        is_pending = pending.copy()
        mask[ctx] = True
        sub = t.filter(pa.array(mask))
        return sub.append_column("__emit", pa.array(is_pending[mask]))

    new_key = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.flatnonzero(new_key)
    run_start = starts[np.cumsum(new_key) - 1]
    lo = np.maximum(arange - w + 1, run_start)
    mean = _window_mean(
        t.column(value_col).to_numpy(zero_copy_only=False), lo, arange
    )
    final = ~pending
    sub = t.filter(pa.array(final))
    return sub.drop_columns([value_col]).append_column(
        out_col, pa.array(mean[final], pa.float64(), from_pandas=True)
    )


def _window_mean(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Mean of ``vals[lo[i]..hi[i]]`` per row via padded cumsums, skipping
    NaN; an empty/all-null window yields NaN."""
    vals = vals.astype(np.float64, copy=False)
    valid = ~np.isnan(vals)
    cs = np.r_[0.0, np.cumsum(np.where(valid, vals, 0.0))]
    cc = np.r_[0, np.cumsum(valid)]
    s = cs[hi + 1] - cs[lo]
    c = cc[hi + 1] - cc[lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(c > 0, s / np.maximum(c, 1), np.nan)


class _MergeBoundaryRolling:
    """groupby(key) repair: order one boundary key's pending + context rows
    and re-run the window over the group (group-local windows equal global
    ones — see module docstring), emitting only the pending rows."""

    def __init__(self, ts_col: str, tie: str, value_col: str, w: int,
                 out_col: str):
        self.ts_col = ts_col
        self.tie = tie
        self.value_col = value_col
        self.w = w
        self.out_col = out_col

    def __call__(self, g: pa.Table) -> pa.Table:
        g = g.sort_by([(self.ts_col, "ascending"), (self.tie, "ascending")])
        n = len(g)
        arange = np.arange(n, dtype=np.int64)
        lo = np.maximum(arange - self.w + 1, 0)
        mean = _window_mean(
            g.column(self.value_col).to_numpy(zero_copy_only=False), lo, arange
        )
        emit = g.column("__emit").to_numpy(zero_copy_only=False)
        sub = g.filter(pa.array(emit))
        return sub.drop_columns([self.value_col, "__emit"]).append_column(
            self.out_col, pa.array(mean[emit], pa.float64(), from_pandas=True)
        )


def rolling_mean(ds, key: str, ts_col: str, tie: str, value_col: str,
                 window: int, out_col: str = "rolling_mean"):
    """Trailing ``window``-row mean of ``value_col`` per ``key`` in
    ``(ts_col, tie)`` order.  Returns a Dataset with columns
    ``[key, ts_col, tie, out_col]`` — one row per surviving input row."""
    if window < 1:
        raise ValueError(f"rolling_mean: window must be ≥ 1, got {window}")

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col)))
        return t.select([key, ts_col, tie, value_col]).filter(mask)

    sorted_ds = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([key, ts_col, tie])
        .materialize()  # the sort builds these blocks anyway; pinning lets
    )                   # the two block passes share them

    finals = sorted_ds.map_batches(
        lambda t: _rolling_block(t, key, value_col, window, out_col, "finals"),
        batch_format="pyarrow", batch_size=None,
    )
    pendctx = sorted_ds.map_batches(
        lambda t: _rolling_block(t, key, value_col, window, out_col, "pendctx"),
        batch_format="pyarrow", batch_size=None,
    )
    merge = _MergeBoundaryRolling(ts_col, tie, value_col, window, out_col)
    merged = pendctx.groupby(key).map_groups(
        lambda g, _m=merge: _m(g), batch_format="pyarrow"
    )
    return finals.union(merged)
