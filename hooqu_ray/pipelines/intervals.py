"""Interval (range) join: attach every interval ``[start, end)`` of the
same key that CONTAINS a point's timestamp — ``JOIN i ON p.key = i.key AND
p.ts >= i.start AND p.ts < i.end`` (one output row per matching pair, SQL
inner-join semantics).

The reference has no join surface (SURVEY §2.3); range joins are how event
streams meet campaign windows, config epochs, maintenance windows, error
windows — interval sets that are DIMENSION-sized (thousands to low
millions), while the point side is the 100-TB fact stream.  The shape
follows ``functions/joins.enrich_join``: the interval side is normalized
to one Arrow table sorted by ``(key, start)``, shipped ONCE via
``ray.put`` (zero-copy plasma read per worker), and every point batch pays
two vectorized ``searchsorted`` calls (key range, then start prefix within
it) plus one gather to emit its pairs — the fact side never shuffles and
there is no all-to-all anywhere.

Cost model: per point, candidates are the key's intervals with
``start <= ts``; the end-bound filter is applied after a vectorized
gather, so a key whose intervals pile up early (many long-dead intervals)
pays O(#candidates) per point.  That is inherent to the output when
intervals overlap (the join IS many-to-many); for non-overlapping interval
sets the candidate superset can be cut to 1 by passing
``assume_disjoint=True``, which takes only the LAST interval with
``start <= ts`` per point.  For an interval side too large to broadcast,
shard it by key hash range and union per-shard passes (the
``util.shard_codes`` pattern) — documented, same trade as ``enrich_join``.

Nulls: points or intervals with a null key/timestamp are dropped (SQL
equality and range predicates are never true on NULL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _interval_table(intervals, int_key: str, int_start: str, int_end: str,
                    int_cols) -> pa.Table:
    """Normalize the interval side to one local Arrow table sorted by
    ``(key, start)``, null keys/bounds dropped."""
    if hasattr(intervals, "to_arrow_refs"):  # ray.data.Dataset
        from ..util import collect_arrow, dataset_arrow_schema

        schema = dataset_arrow_schema(intervals)
        intervals = collect_arrow(intervals)
        if intervals is None:  # empty interval side: join matches nothing
            intervals = schema.empty_table() if schema is not None else pa.table(
                {c: pa.array([]) for c in (int_key, int_start, int_end, *int_cols)}
            )
    elif not isinstance(intervals, pa.Table):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    intervals = intervals.select([int_key, int_start, int_end, *int_cols])
    mask = pc.and_(
        pc.and_(pc.is_valid(intervals.column(int_key)),
                pc.is_valid(intervals.column(int_start))),
        pc.is_valid(intervals.column(int_end)),
    )
    intervals = intervals.filter(mask).combine_chunks()
    return intervals.sort_by(
        [(int_key, "ascending"), (int_start, "ascending")]
    )


class _IntervalProbe:
    """``map_batches`` stage: probe each point batch against the broadcast
    sorted interval table.  Vectorized: key range via ``searchsorted`` on
    the interval key column, start-prefix via ``searchsorted`` on starts,
    pair emission via cumsum-offset ``repeat``/gather, end-bound filter on
    the gathered candidates."""

    def __init__(self, int_ref, point_key: str, point_ts: str,
                 int_key: str, int_start: str, int_end: str, int_cols,
                 assume_disjoint: bool):
        self.int_ref = int_ref
        self.point_key = point_key
        self.point_ts = point_ts
        self.int_key = int_key
        self.int_start = int_start
        self.int_end = int_end
        self.int_cols = list(int_cols)
        self.assume_disjoint = assume_disjoint
        self._cache = None

    def _intervals(self):
        if self._cache is None:
            import ray

            tbl = self.int_ref
            tbl = tbl if isinstance(tbl, pa.Table) else ray.get(tbl)
            self._cache = (
                tbl,
                tbl.column(self.int_key).to_numpy(zero_copy_only=False),
                tbl.column(self.int_start).to_numpy(zero_copy_only=False),
                tbl.column(self.int_end).to_numpy(zero_copy_only=False),
            )
        return self._cache

    def __call__(self, t: pa.Table) -> pa.Table:
        tbl, ikeys, istarts, iends = self._intervals()
        mask = pc.and_(pc.is_valid(t.column(self.point_key)),
                       pc.is_valid(t.column(self.point_ts)))
        t = t.filter(mask)
        pkeys = t.column(self.point_key).to_numpy(zero_copy_only=False)
        pts = t.column(self.point_ts).to_numpy(zero_copy_only=False)
        # starts are sorted only WITHIN a key run, so the start-prefix search
        # runs per unique batch key (one vectorized searchsorted per key
        # against its run slice), not over the full start array; points are
        # bucketed by key via one argsort so the loop is O(n log) total
        uniq, inv = np.unique(pkeys, return_inverse=True)
        ulo = np.searchsorted(ikeys, uniq, side="left")
        uhi = np.searchsorted(ikeys, uniq, side="right")
        klo = ulo[inv]
        hi = np.empty(len(pkeys), dtype=np.int64)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        for u in range(len(uniq)):
            sel = order[bounds[u]:bounds[u + 1]]
            hi[sel] = ulo[u] + np.searchsorted(
                istarts[ulo[u]:uhi[u]], pts[sel], side="right"
            )
        if self.assume_disjoint:
            cand = hi - 1
            keep = cand >= klo
            point_idx = np.flatnonzero(keep)
            cand = cand[keep]
        else:
            counts = hi - klo
            point_idx = np.repeat(np.arange(len(t), dtype=np.int64), counts)
            offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
            cand = (np.arange(int(counts.sum()), dtype=np.int64)
                    - np.repeat(offs, counts) + np.repeat(klo, counts))
        keep = pts[point_idx] < iends[cand]
        point_idx, cand = point_idx[keep], cand[keep]
        out = t.take(pa.array(point_idx, pa.int64()))
        gather = pa.array(cand, pa.int64())
        for c in self.int_cols:
            out = out.append_column(c, tbl.column(c).take(gather))
        return out


def interval_join(points, intervals, point_key: str, int_key: str,
                  point_ts: str, int_start: str, int_end: str,
                  int_cols, assume_disjoint: bool = False):
    """Join each point row to every interval of the same key containing its
    timestamp (``start <= ts < end``); appends ``int_cols`` per match, one
    output row per (point, interval) pair.  ``assume_disjoint=True`` takes
    only the latest-starting candidate (valid when a key's intervals never
    overlap — config epochs, sessions) and skips the pair blow-up."""
    import ray

    int_cols = list(int_cols)
    if not int_cols:
        raise ValueError("interval_join: int_cols must name ≥ 1 payload column")
    overlap = {point_key, point_ts} & set(int_cols)
    if overlap:
        raise ValueError(f"interval_join: column name collision: {sorted(overlap)}")
    tbl = _interval_table(intervals, int_key, int_start, int_end, int_cols)
    ref = ray.put(tbl)
    probe = _IntervalProbe(ref, point_key, point_ts, int_key, int_start,
                           int_end, int_cols, assume_disjoint)
    return points.map_batches(
        lambda t, _p=probe: _p(t), batch_format="pyarrow"
    )
