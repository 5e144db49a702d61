"""Single-scan column profiler: the 'what is in this table?' entry point.

The reference plans but never ships column profiles (its README sketches
metrics-repository-driven profiling; cf. /root/reference/README.rst:154-157
and the MetricsRepository placeholder at
hooqu/analyzers/runners/analysis_runner.py:67); Deequ-style engines expose
it as ``ColumnProfilerRunner``.  Here a profile is just a bundle of
already-mergeable analyzer states evaluated in ONE shared distributed scan
(``runner.do_analysis_run`` computes every per-column analyzer over the
same block pass, so profiling N columns costs one read of those columns —
not N scans), then folded into one row per column:

- every column: ``completeness`` (non-null fraction) and
  ``approx_distinct`` (HLL sketch — exact distinct would be a full
  shuffle PER COLUMN, the one thing a 100-TB profile cannot afford);
- numeric columns: ``min / max / mean / std``;
- string columns: ``min_len / max_len``.

Metrics that fail on a column (e.g. all-null) fold to null, never raise —
a profile must describe dirty data, not crash on it.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import pyarrow as pa

from .analyzers.scan import (
    Completeness,
    MaxLength,
    Maximum,
    Mean,
    MinLength,
    Minimum,
    StandardDeviation,
)
from .analyzers.sketches import ApproxCountDistinct
from .runner import do_analysis_run
from .util import dataset_arrow_schema


_NUMERIC_KINDS = ("int", "uint", "float", "decimal", "double", "halffloat")


def _is_numeric(typ: pa.DataType) -> bool:
    return (pa.types.is_integer(typ) or pa.types.is_floating(typ)
            or pa.types.is_decimal(typ))


def _is_string(typ: pa.DataType) -> bool:
    return pa.types.is_string(typ) or pa.types.is_large_string(typ)


def _metric_value(ctx, analyzer) -> Optional[float]:
    """Metric value or None (Failure metrics and non-finite sentinels fold
    to null in the profile)."""
    metric = ctx.metric_map.get(analyzer)
    if metric is None:
        return None
    try:
        v = float(metric.value.get())
    except Exception:  # noqa: BLE001 — Failure metric
        return None
    return v if math.isfinite(v) else None


def profile(ds, columns: Optional[Sequence[str]] = None) -> pa.Table:
    """Profile ``columns`` (default: every numeric/string column) of ``ds``
    in one shared scan.  Returns an Arrow table with one row per column:
    ``column, dtype, completeness, approx_distinct, min, max, mean, std,
    min_len, max_len`` (inapplicable cells null), sorted by column name."""
    schema = dataset_arrow_schema(ds)
    if schema is None:
        raise ValueError("profile: dataset has no schema (empty input?)")
    if columns is None:
        columns = [f.name for f in schema
                   if _is_numeric(f.type) or _is_string(f.type)]
    columns = sorted(columns)
    missing = [c for c in columns if schema.get_field_index(c) < 0]
    if missing:
        raise KeyError(f"profile: columns not in dataset: {missing}")

    plan: dict[str, dict[str, object]] = {}
    analyzers: list = []
    for c in columns:
        typ = schema.field(c).type
        entry: dict[str, object] = {
            "completeness": Completeness(c),
            "approx_distinct": ApproxCountDistinct(c),
        }
        if _is_numeric(typ):
            entry.update(min=Minimum(c), max=Maximum(c), mean=Mean(c),
                         std=StandardDeviation(c))
        elif _is_string(typ):
            entry.update(min_len=MinLength(c), max_len=MaxLength(c))
        plan[c] = entry
        analyzers.extend(entry.values())

    ctx = do_analysis_run(ds, analyzers)

    def col(metric_key: str):
        return [_metric_value(ctx, plan[c][metric_key])
                if metric_key in plan[c] else None for c in columns]

    distinct = col("approx_distinct")
    return pa.table(
        {
            "column": pa.array(columns, pa.string()),
            "dtype": pa.array([str(schema.field(c).type) for c in columns],
                              pa.string()),
            "completeness": pa.array(col("completeness"), pa.float64()),
            "approx_distinct": pa.array(
                [int(v) if v is not None else None for v in distinct],
                pa.int64()),
            "min": pa.array(col("min"), pa.float64()),
            "max": pa.array(col("max"), pa.float64()),
            "mean": pa.array(col("mean"), pa.float64()),
            "std": pa.array(col("std"), pa.float64()),
            "min_len": pa.array(
                [int(v) if v is not None else None for v in col("min_len")],
                pa.int64()),
            "max_len": pa.array(
                [int(v) if v is not None else None for v in col("max_len")],
                pa.int64()),
        }
    )


def grouped_profile(ds, group_col: str, columns: Sequence[str]):
    """Per-GROUP data-quality report card — for every ``(group, column)``
    pair: row count, null count and EXACT distinct-value count — the
    per-source drill-down of :func:`profile` ("which crawl shard went
    bad") that a global profile averages away.

    Scale shape: one slim per-column pipeline — null/row counts reduce
    through per-block combiners + :func:`tree_group_sum` (never a row
    shuffle), and the exact distinct count rides :func:`tree_distinct`
    over ``(group, value)`` pairs (per-block dedup first, bucketed hash
    exchange when the pair count stays corpus-sized) followed by a
    bounded per-group count fold.  Exact distincts are affordable here
    because the reduction is over DISTINCT pairs, not rows; for
    hot-column triage at extreme cardinality use
    ``relational.grouped_approx_count_distinct`` instead.  Null group
    keys drop (grouped-op convention); SQL parity: ``count(DISTINCT
    col)`` excludes nulls.  Returns
    ``[group_col, col_name, n_rows, n_null, n_distinct]``."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from .functions.shuffle import tree_distinct, tree_group_sum
    from .util import dataset_arrow_schema

    columns = list(columns)
    if not columns:
        raise ValueError("columns must be non-empty")
    in_schema = dataset_arrow_schema(ds)
    gtype = (in_schema.field(group_col).type if in_schema is not None
             and group_col in in_schema.names else pa.string())
    out_schema = pa.schema([
        (group_col, gtype), ("col_name", pa.string()),
        ("n_rows", pa.int64()), ("n_null", pa.int64()),
        ("n_distinct", pa.int64())])

    parts = []
    for col in columns:
        def counts(t: pa.Table, col=col) -> pa.Table:
            if len(t) == 0 or not {group_col, col}.issubset(t.column_names):
                return pa.table({})
            t = t.filter(pc.is_valid(t.column(group_col)))
            sub = pa.table({
                group_col: t.column(group_col),
                "n_rows": pa.array(np.ones(len(t), np.int64)),
                "n_null": pc.cast(
                    pc.invert(pc.is_valid(t.column(col))), pa.int64()),
            })
            return sub

        cnt = tree_group_sum(
            ds.map_batches(counts, batch_format="pyarrow"),
            [group_col], ["n_rows", "n_null"])

        def pairs(t: pa.Table, col=col) -> pa.Table:
            if len(t) == 0 or not {group_col, col}.issubset(t.column_names):
                return pa.table({})
            mask = pc.and_(pc.is_valid(t.column(group_col)),
                           pc.is_valid(t.column(col)))
            t = t.filter(mask)
            return pa.table({group_col: t.column(group_col),
                             "__v": t.column(col)})

        dist = tree_group_sum(
            tree_distinct(ds.map_batches(pairs, batch_format="pyarrow"),
                          [group_col, "__v"]).map_batches(
                lambda t: (t.select([group_col]).append_column(
                    "n_distinct", pa.array(np.ones(len(t), np.int64)))
                    if group_col in t.column_names else pa.table({})),
                batch_format="pyarrow"),
            [group_col], ["n_distinct"])

        from .functions.joins import enrich_join
        from .util import collect_arrow

        # one row per group — collect ONCE; an all-null column yields an
        # EMPTY fold whose schema enrich_join couldn't resolve
        dist_tbl = collect_arrow(dist)
        if dist_tbl is None or len(dist_tbl) == 0:
            dist_tbl = pa.schema([(group_col, gtype),
                                  ("n_distinct", pa.int64())]).empty_table()
        merged = enrich_join(cnt, dist_tbl, group_col, group_col,
                             ["n_distinct"], how="left")

        def finish(t: pa.Table, col=col) -> pa.Table:
            if len(t) == 0 or "n_rows" not in t.column_names:
                return out_schema.empty_table()
            nd = pc.fill_null(pc.cast(t.column("n_distinct"), pa.int64()), 0)
            return pa.table({
                group_col: t.column(group_col),
                "col_name": pa.array([col] * len(t), pa.string()),
                "n_rows": t.column("n_rows"),
                "n_null": t.column("n_null"),
                "n_distinct": nd})

        parts.append(merged.map_batches(finish, batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.union(rd.from_arrow(out_schema.empty_table()))
