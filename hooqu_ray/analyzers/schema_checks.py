"""Schema-level analyzers — metrics computed on the DRIVER from
``Dataset.schema()``: no scan, no shuffle, free at any data scale.

The reference only checks column existence / dtype as PRECONDITIONS that
fail OTHER analyzers (``hooqu/analyzers/preconditions.py:27-51``); Deequ
exposes them as first-class constraints (``hasColumn`` / ``hasDataType``).
These make the schema itself a checkable property:

- :class:`ColumnExists` — 1.0 when the column is in the schema, else 0.0.
- :class:`ColumnDtype` — 1.0 when the column's Arrow type belongs to the
  requested KIND (``numeric`` / ``integer`` / ``floating`` / ``string`` /
  ``boolean`` / ``temporal`` / ``binary`` / ``list``), else 0.0; a missing
  column is a Failure metric (precondition), matching every other
  column analyzer's missing-column behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..metrics import DoubleMetric, Entity, metric_from_value
from .base import Analyzer, has_column

DTYPE_KINDS = {
    "numeric": lambda t: (pa.types.is_integer(t) or pa.types.is_floating(t)
                          or pa.types.is_decimal(t)),
    "integer": pa.types.is_integer,
    "floating": pa.types.is_floating,
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "boolean": pa.types.is_boolean,
    "temporal": lambda t: (pa.types.is_timestamp(t) or pa.types.is_date(t)
                           or pa.types.is_time(t)),
    "binary": lambda t: (pa.types.is_binary(t)
                         or pa.types.is_large_binary(t)),
    "list": lambda t: pa.types.is_list(t) or pa.types.is_large_list(t),
}


class SchemaAnalyzer(Analyzer):
    """Marker base: the runner resolves these straight from the schema."""

    def metric_from_schema(self, schema: pa.Schema) -> DoubleMetric:
        raise NotImplementedError


@dataclass(frozen=True, repr=False)
class ColumnExists(SchemaAnalyzer):
    column: str

    @property
    def name(self) -> str:
        return "ColumnExists"

    @property
    def instance(self) -> str:
        return self.column

    def metric_from_schema(self, schema: pa.Schema) -> DoubleMetric:
        return metric_from_value(
            1.0 if self.column in schema.names else 0.0,
            self.name, self.instance, Entity.COLUMN)


@dataclass(frozen=True, repr=False)
class ColumnDtype(SchemaAnalyzer):
    column: str
    kind: str

    def __post_init__(self):
        if self.kind not in DTYPE_KINDS:
            raise ValueError(
                f"unknown dtype kind {self.kind!r}; "
                f"choose from {sorted(DTYPE_KINDS)}")

    @property
    def name(self) -> str:
        return "ColumnDtype"

    @property
    def instance(self) -> str:
        return f"{self.column},{self.kind}"

    def _preconditions(self, schema: pa.Schema) -> None:
        has_column(schema, self.column)

    def metric_from_schema(self, schema: pa.Schema) -> DoubleMetric:
        ok = DTYPE_KINDS[self.kind](schema.field(self.column).type)
        return metric_from_value(1.0 if ok else 0.0,
                                 self.name, self.instance, Entity.COLUMN)


# Arrow → DuckDB type-name mapping for the common analytics types, so
# schema_diff's output is directly comparable with a SQL DESCRIBE (the
# same trick the has_dtype gate oracles use); unmapped types fall back to
# their Arrow name (upper-cased) and still diff consistently engine-side.
_DUCKDB_TYPE_NAMES = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INTEGER",
    "int64": "BIGINT", "uint8": "UTINYINT", "uint16": "USMALLINT",
    "uint32": "UINTEGER", "uint64": "UBIGINT", "float": "FLOAT",
    "double": "DOUBLE", "string": "VARCHAR", "large_string": "VARCHAR",
    "bool": "BOOLEAN", "binary": "BLOB", "large_binary": "BLOB",
    "date32[day]": "DATE", "timestamp[us]": "TIMESTAMP",
    "timestamp[ms]": "TIMESTAMP", "timestamp[ns]": "TIMESTAMP",
}


def sql_type_name(t: pa.DataType) -> str:
    """DuckDB-style name of an Arrow type (lists map element-wise to
    ``ELEM[]``)."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return sql_type_name(t.value_type) + "[]"
    return _DUCKDB_TYPE_NAMES.get(str(t), str(t).upper())


def schema_diff(ds_a, ds_b) -> pa.Table:
    """Schema drift between two datasets/snapshots — the column-level
    companion to the row-level ``dedup.snapshot_diff``: one row per
    column with ``status ∈ {added, removed, changed, unchanged}``
    (``a → b`` direction; ``changed`` = type name differs) and the
    DuckDB-style type names on each side.  ``changed`` compares the
    ARROW types, not the display names — ``timestamp[ns] →
    timestamp[us]`` or ``string → large_string`` both render as the
    same SQL name yet still flag (that silent re-type is exactly what
    the guard exists for).  Resolved on the DRIVER from
    ``Dataset.schema()`` — zero data passes, free at any scale.
    Accepts ``ray.data.Dataset``, Arrow tables/schemas, or pandas
    DataFrames."""
    from ..util import dataset_arrow_schema

    def resolve(x) -> pa.Schema:
        if isinstance(x, pa.Schema):
            return x
        if isinstance(x, pa.Table):
            return x.schema
        if hasattr(x, "dtypes") and hasattr(x, "columns"):  # pandas
            return pa.Schema.from_pandas(x, preserve_index=False)
        s = dataset_arrow_schema(x)
        if s is None:
            return pa.schema([])
        return s

    sa, sb = resolve(ds_a), resolve(ds_b)
    ta = {f.name: f.type for f in sa}
    tb = {f.name: f.type for f in sb}
    cols = sorted(set(ta) | set(tb))
    status, da, db = [], [], []
    for c in cols:
        a, b = ta.get(c), tb.get(c)
        if a is None:
            status.append("added")
        elif b is None:
            status.append("removed")
        elif a != b:
            status.append("changed")
        else:
            status.append("unchanged")
        da.append(None if a is None else sql_type_name(a))
        db.append(None if b is None else sql_type_name(b))
    return pa.table({"col": pa.array(cols, pa.string()),
                     "status": pa.array(status, pa.string()),
                     "dtype_a": pa.array(da, pa.string()),
                     "dtype_b": pa.array(db, pa.string())})
