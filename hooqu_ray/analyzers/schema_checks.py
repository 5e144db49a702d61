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
