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


def _span_scalar(ts: np.ndarray, span_seconds: float):
    """``span`` in the ts array's own unit: timedelta64 for datetime axes,
    plain float for numeric axes."""
    if ts.dtype.kind == "M":
        return np.timedelta64(int(round(span_seconds * 1e6)), "us")
    return span_seconds


def _time_window_stats(ts: np.ndarray, vals: np.ndarray, starts: np.ndarray,
                       ends: np.ndarray, span):
    """Per-row ``(mean, n)`` over the ts-set window ``[t − span, t]`` within
    each ``[start, end)`` key run: two ``searchsorted`` per run + padded
    cumsums, null values skipped by the mean, ``n`` counts all window rows."""
    n = len(ts)
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        seg = ts[s:e]
        lo[s:e] = s + np.searchsorted(seg, seg - span, side="left")
        hi[s:e] = s + np.searchsorted(seg, seg, side="right")
    vals = vals.astype(np.float64, copy=False)
    valid = ~np.isnan(vals)
    cs = np.r_[0.0, np.cumsum(np.where(valid, vals, 0.0))]
    cc = np.r_[0, np.cumsum(valid)]
    sv = cs[hi] - cs[lo]
    cv = cc[hi] - cc[lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cv > 0, sv / np.maximum(cv, 1), np.nan)
    return mean, hi - lo


def _time_block(t: pa.Table, key: str, ts_col: str, value_col: str,
                span_seconds: float, emit: str) -> pa.Table:
    """One vectorized pass over a (key, ts)-sorted block for the time
    window.  ``emit='finals'``: rows whose window is provably in-block.
    ``emit='pendctx'``: boundary rows — pending (window may cross a block
    edge: first-key rows with ``ts <= first_ts + span``, plus last-key rows
    tied with the block's last ts, whose equal-ts peers may sit in the next
    block) with ``__emit`` true, and context rows (last-key rows within
    ``span`` of the block's last ts; first-key rows tied with the first ts)
    with ``__emit`` false."""
    n = len(t)
    if n == 0:
        if emit == "finals":
            return t.drop_columns([value_col]).append_column(
                "tw_mean", pa.array([], pa.float64())
            ).append_column("tw_n", pa.array([], pa.int64()))
        return t.append_column("__emit", pa.array([], pa.bool_()))
    keys = t.column(key).to_numpy(zero_copy_only=False)
    ts = t.column(ts_col).to_numpy(zero_copy_only=False)
    span = _span_scalar(ts, span_seconds)
    first_key = keys == keys[0]
    last_key = keys == keys[-1]
    pending = (first_key & (ts <= ts[0] + span)) | (last_key & (ts == ts[-1]))

    if emit == "pendctx":
        ctx = (last_key & (ts >= ts[-1] - span)) | (first_key & (ts == ts[0]))
        mask = pending | ctx
        sub = t.filter(pa.array(mask))
        return sub.append_column("__emit", pa.array(pending[mask]))

    new_key = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.flatnonzero(new_key)
    ends = np.r_[starts[1:], n]
    mean, cnt = _time_window_stats(
        ts, t.column(value_col).to_numpy(zero_copy_only=False),
        starts, ends, span,
    )
    final = ~pending
    sub = t.filter(pa.array(final))
    return sub.drop_columns([value_col]).append_column(
        "tw_mean", pa.array(mean[final], pa.float64(), from_pandas=True)
    ).append_column("tw_n", pa.array(cnt[final], pa.int64()))


class _MergeBoundaryTime:
    """groupby(key) repair for the time window: one boundary key's pending +
    context rows, re-windowed over the group (a pending row's every global
    window row is in the group — in-block rows inside its window satisfy the
    pending bound themselves, cross-block rows are inside the adjacent
    blocks' span-tail context), emitting only pending rows.  Group size is
    bounded by the key's row density within ``span`` of each block edge —
    a window wider than a whole block degrades toward per-key grouping,
    never worse than a plain ``groupby(key)`` over the full data."""

    def __init__(self, ts_col: str, value_col: str, span_seconds: float):
        self.ts_col = ts_col
        self.value_col = value_col
        self.span_seconds = span_seconds

    def __call__(self, g: pa.Table) -> pa.Table:
        g = g.sort_by([(self.ts_col, "ascending")])
        ts = g.column(self.ts_col).to_numpy(zero_copy_only=False)
        span = _span_scalar(ts, self.span_seconds)
        mean, cnt = _time_window_stats(
            ts, g.column(self.value_col).to_numpy(zero_copy_only=False),
            np.array([0]), np.array([len(g)]), span,
        )
        emit = g.column("__emit").to_numpy(zero_copy_only=False)
        sub = g.filter(pa.array(emit))
        return sub.drop_columns([self.value_col, "__emit"]).append_column(
            "tw_mean", pa.array(mean[emit], pa.float64(), from_pandas=True)
        ).append_column("tw_n", pa.array(cnt[emit], pa.int64()))


def time_window_mean(ds, key: str, ts_col: str, id_col: str, value_col: str,
                     span_seconds: float):
    """Trailing TIME-window aggregate per key: for every row, the mean of
    ``value_col`` and the row count over the key's rows with ``ts`` in
    ``[t − span, t]`` — the ts-SET window (equal-ts peers always included,
    regardless of order), i.e. SQL's ``(SELECT avg(v), count(*) FROM self i
    WHERE i.key = o.key AND i.ts BETWEEN o.ts - span AND o.ts)``.  Same
    sort + vectorized block pass + boundary repair discipline as
    :func:`rolling_mean`; see ``_MergeBoundaryTime`` for the dense-window
    caveat.  Returns ``[key, ts_col, id_col, tw_mean, tw_n]``."""
    if span_seconds < 0:
        raise ValueError(f"time_window_mean: span must be ≥ 0, got {span_seconds}")

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col)))
        return t.select([key, ts_col, id_col, value_col]).filter(mask)

    sorted_ds = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([key, ts_col, id_col])
        .materialize()
    )
    finals = sorted_ds.map_batches(
        lambda t: _time_block(t, key, ts_col, value_col, span_seconds, "finals"),
        batch_format="pyarrow", batch_size=None,
    )
    pendctx = sorted_ds.map_batches(
        lambda t: _time_block(t, key, ts_col, value_col, span_seconds, "pendctx"),
        batch_format="pyarrow", batch_size=None,
    )
    merge = _MergeBoundaryTime(ts_col, value_col, span_seconds)
    merged = pendctx.groupby(key).map_groups(
        lambda g, _m=merge: _m(g), batch_format="pyarrow"
    )
    return finals.union(merged)


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


def hopping_window_agg(ds, key_col: str, ts_col: str, value_col: str,
                       window_us: int, hop_us: int):
    """Hopping (overlapping sliding) window aggregate: count + mean of
    ``value_col`` per ``(key, window_start)`` where windows are
    ``[s, s + window)`` for every ``s ≡ 0 (mod hop)`` — each event lands
    in ``window/hop`` windows (tumbling = the special case window == hop;
    cf. the trailing per-event window of :func:`time_window_mean`).

    Embarrassingly parallel combiner: each block ENUMERATES its rows'
    window memberships vectorized (ragged repeat/offset arithmetic, no
    Python per row) and pre-aggregates per (key, window) BEFORE the one
    ``groupby`` shuffle — the shuffle moves at most
    ``#blocks × #keys × #windows-per-block`` slim partial rows, never the
    events.  Null keys/timestamps are dropped (SQL GROUP BY over derived
    keys); null VALUES count toward ``n`` but not the mean (SQL
    ``count(*)`` / ``avg`` semantics), and an all-null window's mean is
    null."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import dataset_arrow_schema

    if window_us <= 0 or hop_us <= 0 or window_us % hop_us:
        raise ValueError(
            "hopping_window_agg: window_us must be a positive multiple of hop_us"
        )
    # resolve the key type once so empty-block fallbacks agree with real
    # blocks (hardcoded string would break integer group keys)
    schema = dataset_arrow_schema(ds)
    key_type = (
        schema.field(key_col).type
        if schema is not None and key_col in schema.names
        else pa.string()
    )

    def block_partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], key_type),
                "__ws": pa.array([], pa.int64()),
                "__n": pa.array([], pa.int64()),
                "__nv": pa.array([], pa.int64()),
                "__sum": pa.array([], pa.float64()),
            }
        )
        if key_col not in t.column_names or len(t) == 0:
            return empty
        keep = pc.and_(
            pc.is_valid(t.column(key_col)), pc.is_valid(t.column(ts_col))
        )
        t = t.filter(keep)
        if len(t) == 0:
            return empty
        ts_col_arr = t.column(ts_col)
        if pa.types.is_timestamp(ts_col_arr.type):
            # normalize to µs so window/hop units are unambiguous
            # (pandas-sourced blocks arrive as timestamp[ns])
            ts_col_arr = pc.cast(ts_col_arr, pa.timestamp("us"))
        ts = pc.cast(ts_col_arr, pa.int64()).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        val_ok = (~np.isnan(vals)).astype(np.float64)
        vals = np.nan_to_num(vals)
        i_max = np.floor_divide(ts, hop_us)
        i_min = np.floor_divide(ts - window_us, hop_us) + 1
        counts = (i_max - i_min + 1).astype(np.int64)
        row_of = np.repeat(np.arange(len(ts), dtype=np.int64), counts)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        slot = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        ws = (i_min[row_of] + slot) * hop_us
        enc = t.column(key_col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = enc.dictionary_encode()
        kcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[row_of]
        order = np.lexsort((ws, kcode))
        k_s, w_s, r_s = kcode[order], ws[order], row_of[order]
        first = np.r_[True, (k_s[1:] != k_s[:-1]) | (w_s[1:] != w_s[:-1])]
        run_id = np.cumsum(first) - 1
        n_run = np.bincount(run_id)
        nv_run = np.bincount(run_id, weights=val_ok[r_s])
        sum_run = np.bincount(run_id, weights=vals[r_s])
        sel = np.flatnonzero(first)
        return pa.table(
            {
                key_col: enc.dictionary.take(pa.array(k_s[sel], pa.int64())),
                "__ws": pa.array(w_s[sel], pa.int64()),
                "__n": pa.array(n_run, pa.int64()),
                "__nv": pa.array(nv_run.astype(np.int64), pa.int64()),
                "__sum": pa.array(sum_run, pa.float64()),
            }
        )

    agg = ds.map_batches(block_partials, batch_format="pyarrow").groupby(
        [key_col, "__ws"]
    ).aggregate(Sum("__n"), Sum("__nv"), Sum("__sum"))

    def finish(t: pa.Table) -> pa.Table:
        if "sum(__n)" not in t.column_names:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    "w_start": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                    "avg_value": pa.array([], pa.float64()),
                }
            )
        n = pc.cast(t.column("sum(__n)"), pa.int64())
        nv = pc.cast(t.column("sum(__nv)"), pa.float64())
        s = t.column("sum(__sum)")
        avg = pc.if_else(
            pc.greater(nv, 0.0), pc.divide(s, nv), pa.scalar(None, pa.float64())
        )
        return pa.table(
            {
                key_col: t.column(key_col),
                "w_start": pc.cast(t.column("__ws"), pa.timestamp("us")),
                "n": n,
                "avg_value": avg,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _running_block(t: pa.Table, key: str, value_col: str, emit: str) -> pa.Table:
    """One vectorized pass over a (key, ts, tie)-sorted block for the
    RUNNING (unbounded-preceding) aggregate.

    ``emit='finals'``: rows of keys interior to the block (their whole
    history is in-block), with ``run_sum`` / ``run_n`` attached.
    ``emit='pend'``: raw rows of the block's first/last key — their prefix
    may continue from an adjacent block, so they are re-accumulated in the
    per-key boundary merge.  Unlike the rolling window no context rows are
    needed: a boundary key contributes ALL its rows as pending in every
    block it touches (it is first or last there by sort contiguity), so the
    merge group holds the key's full history."""
    n = len(t)
    if n == 0:
        if emit == "finals":
            return t.drop_columns([value_col]).append_column(
                "run_sum", pa.array([], pa.float64())
            ).append_column("run_n", pa.array([], pa.int64()))
        return t
    keys = t.column(key).to_numpy(zero_copy_only=False)
    pending = (keys == keys[0]) | (keys == keys[-1])
    if emit == "pend":
        return t.filter(pa.array(pending))

    vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    new_key = np.r_[True, keys[1:] != keys[:-1]]
    run_start = np.flatnonzero(new_key)[np.cumsum(new_key) - 1]
    valid = ~np.isnan(vals)
    cs = np.r_[0.0, np.cumsum(np.where(valid, vals, 0.0))]
    cc = np.r_[0, np.cumsum(valid)]
    arange = np.arange(n, dtype=np.int64)
    s = cs[arange + 1] - cs[run_start]
    c = cc[arange + 1] - cc[run_start]
    run_sum = np.where(c > 0, s, np.nan)  # SQL SUM: all-null prefix → NULL
    run_n = arange - run_start + 1
    final = ~pending
    sub = t.filter(pa.array(final))
    return sub.drop_columns([value_col]).append_column(
        "run_sum", pa.array(run_sum[final], pa.float64(), from_pandas=True)
    ).append_column("run_n", pa.array(run_n[final], pa.int64()))


class _MergeBoundaryRunning:
    """groupby(key) repair for the running aggregate: sort one boundary
    key's full row set by (ts, tie) and accumulate — every row is emitted
    (all are pending)."""

    def __init__(self, ts_col: str, tie: str, value_col: str):
        self.ts_col = ts_col
        self.tie = tie
        self.value_col = value_col

    def __call__(self, g: pa.Table) -> pa.Table:
        g = g.sort_by([(self.ts_col, "ascending"), (self.tie, "ascending")])
        vals = g.column(self.value_col).to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        valid = ~np.isnan(vals)
        s = np.cumsum(np.where(valid, vals, 0.0))
        c = np.cumsum(valid)
        run_sum = np.where(c > 0, s, np.nan)
        return g.drop_columns([self.value_col]).append_column(
            "run_sum", pa.array(run_sum, pa.float64(), from_pandas=True)
        ).append_column(
            "run_n", pa.array(np.arange(1, len(g) + 1, dtype=np.int64), pa.int64())
        )


def running_agg(ds, key: str, ts_col: str, tie: str, value_col: str):
    """Per-key RUNNING aggregate — SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, tie ROWS UNBOUNDED
    PRECEDING)`` plus the per-key ``ROW_NUMBER()`` — the cumulative-state
    operator behind "tokens emitted so far per user", "spend to date per
    account".

    Same discipline as :func:`rolling_mean`: ONE distributed range
    ``sort(key, ts, tie)`` over a 4-column projection, a fully vectorized
    per-block padded-cumsum pass, and a ``groupby(key)`` boundary merge
    that touches only each block's first/last key (≤ 2 keys per block —
    O(#blocks) groups, NOT O(#keys)).  Null semantics match SQL: null
    values don't advance the sum (an all-null prefix yields null);
    ``run_n`` counts every row.  Rows with a null key or ts are dropped
    (cf. ``asof.py``).  ``tie`` must be unique per key.  Returns
    ``[key, ts_col, tie, run_sum, run_n]``."""

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col)))
        return t.select([key, ts_col, tie, value_col]).filter(mask)

    sorted_ds = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([key, ts_col, tie])
        .materialize()  # shared by the two block passes below
    )
    finals = sorted_ds.map_batches(
        lambda t: _running_block(t, key, value_col, "finals"),
        batch_format="pyarrow", batch_size=None,
    )
    pend = sorted_ds.map_batches(
        lambda t: _running_block(t, key, value_col, "pend"),
        batch_format="pyarrow", batch_size=None,
    )
    merge = _MergeBoundaryRunning(ts_col, tie, value_col)
    merged = pend.groupby(key).map_groups(
        lambda g, _m=merge: _m(g), batch_format="pyarrow"
    )
    return finals.union(merged)


def _lag_block(t: pa.Table, key: str, value_col: str, periods: int,
               emit: str, forward: bool = False) -> pa.Table:
    """One vectorized pass over a (key, ts, tie)-sorted block for LAG
    (``forward=False``) or LEAD (``forward=True`` — the block is then
    sorted ts/tie-DESCENDING within each key, so the positional
    predecessor is the logical successor; the output column becomes
    ``next_value`` and the delta flips to ``next − v``).

    ``emit='finals'``: rows with their in-block predecessor resolved (the
    first ``periods`` rows of the block's FIRST key are pending — their
    predecessor may sit in the previous block).  ``emit='pendctx'``: those
    pending rows (``__emit`` true) plus the last ``periods`` rows of the
    block's LAST key as context (``__emit`` false)."""
    out_col = "next_value" if forward else "prev_value"
    n = len(t)
    if n == 0:
        if emit == "finals":
            return t.append_column(
                out_col, pa.array([], pa.float64())
            ).append_column("delta", pa.array([], pa.float64()))
        return t.append_column("__emit", pa.array([], pa.bool_()))
    keys = t.column(key).to_numpy(zero_copy_only=False)
    arange = np.arange(n, dtype=np.int64)
    pending = (keys == keys[0]) & (arange < periods)

    if emit == "pendctx":
        mask = pending.copy()
        ctx = np.flatnonzero(keys == keys[-1])[-periods:]
        mask[ctx] = True
        sub = t.filter(pa.array(mask))
        return sub.append_column("__emit", pa.array(pending[mask]))

    vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    new_key = np.r_[True, keys[1:] != keys[:-1]]
    run_start = np.flatnonzero(new_key)[np.cumsum(new_key) - 1]
    src = arange - periods
    ok = src >= run_start
    prev = np.where(ok, vals[np.maximum(src, 0)], np.nan)
    delta = (prev - vals) if forward else (vals - prev)
    final = ~pending
    sub = t.filter(pa.array(final))
    prev_a = pa.array(prev[final], pa.float64(), from_pandas=True)
    return sub.append_column(out_col, prev_a).append_column(
        "delta", pa.array(delta[final], pa.float64(), from_pandas=True)
    )


class _MergeBoundaryLag:
    """groupby(key) repair: order one boundary key's pending + context rows
    and re-resolve the lag (or lead, ``forward=True``) over the group,
    emitting only pending rows."""

    def __init__(self, ts_col: str, tie: str, value_col: str, periods: int,
                 forward: bool = False):
        self.ts_col = ts_col
        self.tie = tie
        self.value_col = value_col
        self.periods = periods
        self.forward = forward

    def __call__(self, g: pa.Table) -> pa.Table:
        order = "descending" if self.forward else "ascending"
        g = g.sort_by([(self.ts_col, order), (self.tie, order)])
        vals = g.column(self.value_col).to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        n = len(g)
        src = np.arange(n, dtype=np.int64) - self.periods
        prev = np.where(src >= 0, vals[np.maximum(src, 0)], np.nan)
        delta = (prev - vals) if self.forward else (vals - prev)
        emit = g.column("__emit").to_numpy(zero_copy_only=False)
        sub = g.filter(pa.array(emit)).drop_columns(["__emit"])
        out_col = "next_value" if self.forward else "prev_value"
        return sub.append_column(
            out_col, pa.array(prev[emit], pa.float64(), from_pandas=True)
        ).append_column(
            "delta",
            pa.array(delta[emit], pa.float64(), from_pandas=True),
        )


def lag_delta(ds, key: str, ts_col: str, tie: str, value_col: str,
              periods: int = 1):
    """Per-key LAG + delta — SQL ``LAG(v, periods) OVER (PARTITION BY key
    ORDER BY ts, tie)`` and ``v − LAG(v)`` — inter-arrival deltas, spend
    changes, monotonicity checks.

    Same sort-based discipline as :func:`rolling_mean`: one range sort of a
    4-column projection, a vectorized per-block shift, and a boundary
    repair touching only the first ``periods`` rows of each block's first
    key (context = the last ``periods`` rows of the previous block's last
    key).  The first ``periods`` rows of each key get null ``prev_value``
    and ``delta`` (SQL LAG default).  Rows with a null key or ts are
    dropped; ``tie`` must be unique per key.  Returns
    ``[key, ts_col, tie, value_col, prev_value, delta]``."""
    return _lag_lead_scaffold(ds, key, ts_col, tie, value_col, periods,
                              forward=False)


def lead_delta(ds, key: str, ts_col: str, tie: str, value_col: str,
               periods: int = 1):
    """Per-key LEAD + forward delta — SQL ``LEAD(v, periods) OVER
    (PARTITION BY key ORDER BY ts, tie)`` and ``LEAD(v, periods) − v`` —
    "what happens next": next-event values, time-to-next deltas,
    look-ahead labels for sequence models.

    Exactly the :func:`lag_delta` machinery run over the REVERSED
    per-key order: the one range sort is ``sort([key, ts DESC, tie
    DESC])``, under which each row's positional predecessor is its
    logical successor, so the same vectorized shift + O(#blocks)
    boundary repair apply unchanged (the repair re-sorts its ≤
    2·periods-row groups descending).  The last ``periods`` rows of each
    key get null ``next_value``/``delta`` (SQL LEAD default).  Rows with
    a null key or ts are dropped; ``tie`` must be unique per key.
    Returns ``[key, ts_col, tie, value_col, next_value, delta]`` with
    ``delta = next_value − value``."""
    return _lag_lead_scaffold(ds, key, ts_col, tie, value_col, periods,
                              forward=True)


def _lag_lead_scaffold(ds, key: str, ts_col: str, tie: str, value_col: str,
                       periods: int, forward: bool):
    if periods < 1:
        raise ValueError(
            f"{'lead' if forward else 'lag'}_delta: periods must be ≥ 1, "
            f"got {periods}")

    def project(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(ts_col)))
        return t.select([key, ts_col, tie, value_col]).filter(mask)

    sorted_ds = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([key, ts_col, tie],
              descending=[False, forward, forward])
        .materialize()  # shared by the two block passes
    )
    finals = sorted_ds.map_batches(
        lambda t: _lag_block(t, key, value_col, periods, "finals", forward),
        batch_format="pyarrow", batch_size=None,
    )
    pendctx = sorted_ds.map_batches(
        lambda t: _lag_block(t, key, value_col, periods, "pendctx", forward),
        batch_format="pyarrow", batch_size=None,
    )
    merge = _MergeBoundaryLag(ts_col, tie, value_col, periods, forward)
    merged = pendctx.groupby(key).map_groups(
        lambda g, _m=merge: _m(g), batch_format="pyarrow"
    )
    return finals.union(merged)


def _first_last_combine(key: str):
    """Self-mergeable combine for the FIRST/LAST fold: one row per key
    whose ``(__f_ts, __f_tie, first_value)`` is the lexicographically
    EARLIEST candidate seen and ``(__l_ts, __l_tie, last_value)`` the
    LATEST — the earlier of two firsts is the first, so candidates reduce
    through a coalesce tree exactly like ``tree_group_sum`` partials."""
    proj = [key, "__f_ts", "__f_tie", "first_value",
            "__l_ts", "__l_tie", "last_value"]

    def combine(t: pa.Table) -> pa.Table:
        if len(t) == 0 or not set(proj).issubset(t.column_names):
            # schema-less empty aggregate block — caller anchors the schema
            return pa.table({})
        t = t.select(proj)
        tf = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("__f_ts", "ascending"),
            ("__f_tie", "ascending")]))
        kf = tf.column(key).to_numpy(zero_copy_only=False)
        starts = np.r_[True, kf[1:] != kf[:-1]]
        firsts = tf.filter(pa.array(starts)).select(
            [key, "__f_ts", "__f_tie", "first_value"])
        tl = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), ("__l_ts", "ascending"),
            ("__l_tie", "ascending")]))
        kl = tl.column(key).to_numpy(zero_copy_only=False)
        ends = np.r_[kl[1:] != kl[:-1], True]
        lasts = tl.filter(pa.array(ends))
        # both passes emit one row per key in ascending key order — the
        # rows align positionally
        out = firsts
        for c in ("__l_ts", "__l_tie", "last_value"):
            out = out.append_column(c, lasts.column(c))
        return out

    return combine


def grouped_first_last(ds, key: str, ts_col: str, tie: str, value_col: str,
                       *, max_fold_rows: int = 4_000_000, fanin: int = 8):
    """Per-key FIRST_VALUE / LAST_VALUE in ``(ts, tie)`` order — SQL
    ``FIRST_VALUE(v) OVER (PARTITION BY key ORDER BY ts, tie)`` /
    ``LAST_VALUE(v) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND
    UNBOUNDED FOLLOWING)`` — WITHOUT the corpus range sort the rest of
    the window family pays: first/last selection is an algebraic fold
    (the earlier of two firsts is the first), so per-block candidates
    (≤ #keys-in-block rows each) reduce through ``tree_group_sum``-style
    coalesce rounds, and when the key count is corpus-like the partials
    fall back to the bucketed hash exchange (int32 bucket key, one
    vectorized combine per bucket) — never Ray's per-key sort groupby.

    ``value_col`` keeps its input dtype (selection, not arithmetic), and
    a null value at the boundary row is returned as-is (SQL parity).
    Rows with a null key or ts are dropped; ``tie`` must be unique per
    key.  Returns ``[key, first_value, last_value]``, one row per key."""
    import ray.data as rd

    from ..functions.shuffle import _tree_fold, bucketed_group_fold
    from ..util import dataset_arrow_schema

    combine = _first_last_combine(key)

    def prep(t: pa.Table) -> pa.Table:
        # single-sort fast path over the raw corpus block: the first/last
        # orderings coincide here (both are (key, ts, tie)), so one
        # sort_indices yields run starts AND run ends — the generic
        # two-sort combine is only needed in fold rounds, where the f/l
        # candidate columns genuinely differ
        if len(t) == 0 or not {key, ts_col, tie, value_col}.issubset(
                t.column_names):
            return pa.table({})
        mask = pc.and_(pc.is_valid(t.column(key)),
                       pc.is_valid(t.column(ts_col)))
        t = t.filter(mask)
        if len(t) == 0:
            return pa.table({})
        tt = t.take(pc.sort_indices(t, sort_keys=[
            (key, "ascending"), (ts_col, "ascending"), (tie, "ascending")]))
        kk = tt.column(key).to_numpy(zero_copy_only=False)
        starts = np.r_[True, kk[1:] != kk[:-1]]
        ends = np.r_[kk[1:] != kk[:-1], True]
        firsts = tt.filter(pa.array(starts))
        lasts = tt.filter(pa.array(ends))
        return pa.table({
            key: firsts.column(key),
            "__f_ts": firsts.column(ts_col), "__f_tie": firsts.column(tie),
            "first_value": firsts.column(value_col),
            "__l_ts": lasts.column(ts_col), "__l_tie": lasts.column(tie),
            "last_value": lasts.column(value_col),
        })

    partials = ds.map_batches(
        prep, batch_format="pyarrow").materialize()
    n = partials.count()
    schema = dataset_arrow_schema(partials)
    if n == 0 or schema is None:
        in_schema = dataset_arrow_schema(ds)
        ktype = (in_schema.field(key).type if in_schema is not None
                 and key in in_schema.names else pa.string())
        vtype = (in_schema.field(value_col).type if in_schema is not None
                 and value_col in in_schema.names else pa.float64())
        return rd.from_arrow(pa.schema(
            [(key, ktype), ("first_value", vtype),
             ("last_value", vtype)]).empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key not in t.column_names:
            return pa.schema([schema.field(key),
                              schema.field("first_value"),
                              schema.field("last_value")]).empty_table()
        return t.select([key, "first_value", "last_value"])

    if n <= max_fold_rows * fanin:
        folded = _tree_fold(partials, combine, fanin)
        return folded.map_batches(finalize, batch_format="pyarrow")

    # corpus-cardinality keys: the shared bucketed hash exchange (int32
    # bucket key, custom first/last combine per bucket — keeps one
    # maintained exchange implementation incl. its low-block-count
    # repartition guard)
    return bucketed_group_fold(
        partials, [key],
        ["__f_ts", "__f_tie", "first_value", "__l_ts", "__l_tie",
         "last_value"],
        combine=combine, finalize=finalize)


def windowed_count_distinct(ds, ts_col: str, value_col: str,
                            window_seconds: float,
                            out_ts: str = "window_start"):
    """Tumbling-window ``COUNT(DISTINCT v)`` — SQL ``count(DISTINCT v)
    GROUP BY time_bucket(ts)`` — the streaming-analytics staple
    ("distinct active users per hour") as a batch composition: each
    batch stamps its window start (vectorized epoch floor, any window
    length), then :func:`hooqu_ray.pipelines.relational.
    grouped_count_distinct` finishes with its combiner-first bucketed
    exchanges (distinct pairs move, never rows).  Rows with a null
    timestamp drop; null values are not counted, and a window whose
    values are ALL null is absent from the output — a documented
    divergence from SQL, which emits that window with ``n_distinct =
    0`` (the same null-drop convention as the engine's other grouped
    ops).  Returns ``[out_ts, n_distinct]``."""
    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be > 0, got {window_seconds}")
    from ..util import dataset_arrow_schema
    from .relational import grouped_count_distinct

    w_us = int(round(window_seconds * 1e6))
    in_schema = dataset_arrow_schema(ds)
    vtype = (in_schema.field(value_col).type if in_schema is not None
             and value_col in in_schema.names else pa.string())
    # the empty anchor must carry the INPUT's value dtype (CLAUDE.md
    # gotcha — a hardcoded string col would union-crash int values)
    stamp_empty = pa.table({out_ts: pa.array([], pa.timestamp("us")),
                            value_col: pa.array([], vtype)})

    def stamp(t: pa.Table) -> pa.Table:
        if len(t) == 0 or not {ts_col, value_col}.issubset(t.column_names):
            return stamp_empty
        t = t.filter(pc.is_valid(t.column(ts_col)))
        ts = pc.cast(t.column(ts_col), pa.timestamp("us"))
        us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        start = (us // w_us) * w_us
        return pa.table({
            out_ts: pa.array(start.astype("datetime64[us]")),
            value_col: t.column(value_col)})

    return grouped_count_distinct(
        ds.map_batches(stamp, batch_format="pyarrow"), out_ts, value_col)
