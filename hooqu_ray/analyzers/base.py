"""Analyzer model, Ray-Data-first.

An analyzer declares WHAT to measure; the runner decides HOW to execute it
over a ``ray.data.Dataset`` (or an in-memory table).  Three execution shapes
exist, mirroring the reference taxonomy (``hooqu/analyzers/analyzer.py``,
``grouping_analyzers.py``) but re-cut for distributed execution:

- **Scan-shareable**: produces a tiny mergeable ``State`` per Arrow block;
  every scan analyzer in a run shares ONE pass over the data (the reference
  planned this and left it dead code — ``analysis_runner.py:173-230``; for us
  it is the core execution path).
- **Frequency-based**: needs a ``groupby(columns)`` shuffle first
  (Uniqueness & friends).
- **Selection-based**: exact Quantile; computed by distributed k-th element
  selection, not by state merging (the reference declares the merge
  unimplementable — ``quantile.py:15-18``).

Identity/dedup: analyzers are frozen dataclasses; equal analyzers (same
name/instance/where/params) are computed once per run, as pinned by the
reference's tests (``tests/test_analysis_runner.py:41-53``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import pyarrow as pa

from ..metrics import DoubleMetric, Entity, metric_from_failure
from ..states import State


def entity_from(columns: Sequence[str]) -> Entity:
    return Entity.COLUMN if len(columns) == 1 else Entity.MULTICOLUMN


# ---------------------------------------------------------------------------
# Schema preconditions (checked once on the driver against Dataset.schema();
# cheaper than the reference's per-analyzer data checks,
# hooqu/analyzers/preconditions.py:27-51)
# ---------------------------------------------------------------------------

def has_column(schema: pa.Schema, column: str) -> None:
    if column not in schema.names:
        raise KeyError(f"Input data does not include column {column}")


def is_numeric(schema: pa.Schema, column: str) -> None:
    t = schema.field(column).type
    if not (pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)):
        raise ValueError(
            f"Expected type of column {column} to be one of numeric but found {t} instead!"
        )


def is_string(schema: pa.Schema, column: str) -> None:
    t = schema.field(column).type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        raise ValueError(
            f"Expected type of column {column} to be string but found {t} instead!"
        )


class NotColumnSpecifiedException(Exception):
    pass


@dataclass(frozen=True, repr=False)
class Analyzer:
    """Base identity: (name, instance, entity, where [+ subclass params])."""

    @property
    def name(self) -> str:
        raise NotImplementedError

    @property
    def instance(self) -> str:
        raise NotImplementedError

    @property
    def entity(self) -> Entity:
        return Entity.COLUMN

    @property
    def where(self) -> Optional[str]:
        return None

    def check_preconditions(self, schema: pa.Schema) -> Optional[Exception]:
        """First failing precondition against the Arrow schema, else None."""
        try:
            self._preconditions(schema)
        except Exception as ex:  # noqa: BLE001 - converted to Failure metric
            return ex
        return None

    def _preconditions(self, schema: pa.Schema) -> None:
        pass

    def to_failure_metric(self, ex: BaseException) -> DoubleMetric:
        return metric_from_failure(ex, self.name, self.instance, self.entity)

    def __repr__(self) -> str:
        inst = self.instance
        if len(inst) > 120:
            inst = f"{inst[:40]} ... {inst[-40:]}"
        return f"{self.name}({inst})"


class ScanShareableAnalyzer(Analyzer):
    """An analyzer whose work is a mergeable per-block state."""

    def bind(self, schema: pa.Schema) -> "BoundScan":
        """Resolve schema-dependent machinery (compiled predicates, regex
        engine choice) ONCE on the driver; the bound object is shipped to
        workers inside the shared-scan plan."""
        raise NotImplementedError

    def metric_from_state(self, state: Optional[State]) -> DoubleMetric:
        raise NotImplementedError


class BoundScan:
    """Per-run executable form of a scan analyzer.  Must be picklable.

    ``update(table)`` consumes a where-filtered Arrow block and returns a
    partial State (or None when the block contributes nothing)."""

    def update(self, table: pa.Table) -> Optional[State]:
        raise NotImplementedError


class GroupingAnalyzer(Analyzer):
    """Frequency-based analyzer: requires groupby(grouping_columns).

    The runner computes group frequencies ONCE per distinct
    (grouping_columns, where) pair and every frequency-based analyzer on that
    key reuses them — same sharing the reference does in-process
    (``grouping_analyzers.py:30-108``), but behind one hash shuffle."""

    @property
    def grouping_columns(self) -> Sequence[str]:
        raise NotImplementedError

    @property
    def entity(self) -> Entity:
        return entity_from(self.grouping_columns)

    @property
    def instance(self) -> str:
        return ",".join(self.grouping_columns)

    def _preconditions(self, schema: pa.Schema) -> None:
        if not len(self.grouping_columns):
            raise NotColumnSpecifiedException("At least one column needs to be specified!")
        for c in self.grouping_columns:
            has_column(schema, c)

    def frequency_key(self) -> Tuple[Tuple[str, ...], Optional[str]]:
        return (tuple(self.grouping_columns), self.where)

    def metric_from_frequencies(self, freq) -> DoubleMetric:
        """freq: states.FrequenciesAndNumRows reduction over the groups."""
        raise NotImplementedError
