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
