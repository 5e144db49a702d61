"""Sessionization: the classic event-stream window operator, expressed as a
batch Ray Data pipeline.

The reference has no streaming/window surface at all (SURVEY §2.3
"Streaming: nothing"); this is a forward extension for event-log inputs.
Semantics: events of one key ordered by timestamp; a NEW session starts when
the gap from the previous event exceeds ``gap_seconds`` (strictly greater,
microsecond precision).  Session ids are 0-based per key in time order — the
same definition DuckDB expresses with ``lag`` + a running ``sum`` window,
which is the oracle for the driver's correctness gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def session_stats(ds, key: str = "user_id", ts_col: str = "ts",
                  gap_seconds: float = 3600.0, max_group_rows: int = 1_000_000):
    """One row per session: ``(key, session_idx, n_events, t_start, t_end)``.

    Shuffle-light: the grouped sequence apply receives a TWO-COLUMN
    projection (key, ts) — the event payload never moves.  Each key's rows
    are sorted by timestamp inside the group; session breaks and per-session
    aggregates are computed vectorized (numpy diff/cumsum + one pandas
    groupby per key).  Keys larger than ``max_group_rows`` are flagged, not
    materialized (functions.shuffle guard)."""
    from ..functions.shuffle import grouped_sequence_apply

    gap_us = int(round(gap_seconds * 1_000_000))

    def per_key(g):
        import pandas as pd

        ts = g[ts_col].to_numpy()
        us = ts.astype("datetime64[us]").astype(np.int64)
        brk = np.r_[False, np.diff(us) > gap_us]
        sid = np.cumsum(brk)
        agg = (
            pd.DataFrame({"session_idx": sid, "ts": ts})
            .groupby("session_idx", sort=True)["ts"]
            .agg(["count", "min", "max"])
            .reset_index()
        )
        out = pd.DataFrame(
            {
                key: g[key].iloc[0],
                "session_idx": agg["session_idx"].astype("int64"),
                "n_events": agg["count"].astype("int64"),
                "t_start": agg["min"],
                "t_end": agg["max"],
            }
        )
        return out

    proj = ds.map_batches(
        lambda t, _k=key, _t=ts_col: t.select([_k, _t]), batch_format="pyarrow"
    )
    return grouped_sequence_apply(
        proj, key, per_key, order_by=ts_col, max_group_rows=max_group_rows
    )
