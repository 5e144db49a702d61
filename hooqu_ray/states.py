"""Mergeable analyzer states (commutative monoids).

Each state is the partial result computed from one Arrow block; `merge`
combines partials from any two blocks, so a Ray Data ``AggregateFn`` (or any
tree-fold) reproduces the single-pass pandas result exactly.  Merge laws match
the reference (``hooqu/analyzers/analyzer.py:43-51`` and per-analyzer state
classes), including Chan's parallel-variance combine
(``hooqu/analyzers/standard_deviation.py:18-26``).  The reference's
``MinState.sum`` bug (returns a raw float, ``minimum.py:15-16``) is fixed
here: merges are closed over the state type.

``None`` is the universal identity element: ``merge(None, s) == s``.  A block
with zero relevant rows contributes ``None``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, TypeVar

S = TypeVar("S", bound="State")


@dataclass(frozen=True)
class State:
    """Base marker. Subclasses implement ``sum(other) -> same type``."""

    def sum(self, other):
        raise NotImplementedError

    def __add__(self, other):
        return self.sum(other)


def merge_states(a: Optional[S], b: Optional[S]) -> Optional[S]:
    """Fold helper: None is the identity; a FailedState on EITHER side
    poisons the merge (left-side-only poisoning would crash the typed
    ``sum`` of the other operand)."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, FailedState):
        return a
    if isinstance(b, FailedState):
        return b
    return a.sum(b)


@dataclass(frozen=True)
class FailedState(State):
    """Poison state: a per-block computation raised.  Propagates through any
    merge so a single bad block turns the whole metric into a Failure (the
    reference catches per-analyzer exceptions the same way,
    ``analysis_runner.py:160-166``)."""

    error_type: str
    message: str

    def sum(self, other):
        return self

    @staticmethod
    def from_exception(ex: BaseException) -> "FailedState":
        return FailedState(type(ex).__name__, str(ex))

    def to_exception(self) -> Exception:
        from .metrics import MetricCalculationException

        return MetricCalculationException(f"{self.error_type}: {self.message}")


@dataclass(frozen=True)
class NumMatches(State):
    """Row count (reference: size.py:12-17)."""

    num_matches: int

    def sum(self, other: "NumMatches") -> "NumMatches":
        return NumMatches(self.num_matches + other.num_matches)

    def metric_value(self) -> float:
        return float(self.num_matches)


@dataclass(frozen=True)
class NumMatchesAndCount(State):
    """(#rows matching, #rows total) → ratio (reference: analyzer.py:302-321)."""

    num_matches: int
    count: int

    def sum(self, other: "NumMatchesAndCount") -> "NumMatchesAndCount":
        return NumMatchesAndCount(
            self.num_matches + other.num_matches, self.count + other.count
        )

    def metric_value(self) -> float:
        if self.count == 0:
            return float("nan")
        return self.num_matches / self.count


@dataclass(frozen=True)
class MinState(State):
    min_value: float

    def sum(self, other: "MinState") -> "MinState":
        return MinState(min(self.min_value, other.min_value))

    def metric_value(self) -> float:
        return self.min_value


@dataclass(frozen=True)
class MaxState(State):
    max_value: float

    def sum(self, other: "MaxState") -> "MaxState":
        return MaxState(max(self.max_value, other.max_value))

    def metric_value(self) -> float:
        return self.max_value


@dataclass(frozen=True)
class SumState(State):
    sum_value: float

    def sum(self, other: "SumState") -> "SumState":
        return SumState(self.sum_value + other.sum_value)

    def metric_value(self) -> float:
        return self.sum_value


@dataclass(frozen=True)
class MeanState(State):
    total: float
    count: int

    def sum(self, other: "MeanState") -> "MeanState":
        return MeanState(self.total + other.total, self.count + other.count)

    def metric_value(self) -> float:
        if self.count == 0:
            return float("nan")
        return self.total / self.count


@dataclass(frozen=True)
class StandardDeviationState(State):
    """Welford moments (n, avg, m2); merge is Chan's parallel combine —
    byte-identical to the reference law (standard_deviation.py:18-26)."""

    n: float
    avg: float
    m2: float

    def __post_init__(self):
        if not self.n > 0:
            raise ValueError("Standard deviation is undefined for n = 0.")

    def sum(self, other: "StandardDeviationState") -> "StandardDeviationState":
        new_n = self.n + other.n
        delta = other.avg - self.avg
        delta_n = 0.0 if new_n == 0.0 else delta / new_n
        return StandardDeviationState(
            new_n,
            self.avg + delta_n * other.n,
            self.m2 + other.m2 + delta * delta_n * self.n * other.n,
        )

    def metric_value(self) -> float:
        if math.isinf(self.avg):
            return float("inf")
        if math.isnan(self.avg):
            return float("nan")
        return math.sqrt(self.m2 / self.n)


@dataclass(frozen=True)
class CorrelationState(State):
    """Pairwise co-moment state for Pearson correlation of two columns
    (extension beyond the reference, Deequ-style).  Mergeable via the
    bivariate form of Chan's update."""

    n: float
    avg_x: float
    avg_y: float
    m2x: float
    m2y: float
    cxy: float

    def sum(self, other: "CorrelationState") -> "CorrelationState":
        n = self.n + other.n
        dx = other.avg_x - self.avg_x
        dy = other.avg_y - self.avg_y
        f = 0.0 if n == 0.0 else self.n * other.n / n
        return CorrelationState(
            n,
            self.avg_x + (dx * other.n / n if n else 0.0),
            self.avg_y + (dy * other.n / n if n else 0.0),
            self.m2x + other.m2x + dx * dx * f,
            self.m2y + other.m2y + dy * dy * f,
            self.cxy + other.cxy + dx * dy * f,
        )

    def metric_value(self) -> float:
        denom = math.sqrt(self.m2x * self.m2y)
        if denom == 0.0 or math.isnan(denom):
            return float("nan")
        return self.cxy / denom


@dataclass(frozen=True)
class QuantileState(State):
    """Finalized quantile value.  Intentionally not mergeable in the
    reference (quantile.py:15-18); our engine computes it with a distributed
    selection instead of merging states."""

    quantile: float

    def sum(self, other):
        raise NotImplementedError("sum for quantile state not implemented")

    def metric_value(self) -> float:
        return self.quantile


@dataclass(frozen=True)
class FrequenciesAndNumRows(State):
    """Grouped frequencies summary.  At scale we never materialize the
    frequency table on the driver; this state carries only the reductions the
    frequency-based analyzers need:

    - num_rows: rows with ≥1 non-null group key (after `where`)
    - num_groups: distinct key combinations
    - num_singleton_groups: groups with frequency == 1
    - entropy_sum: Σ cnt·ln(cnt) over groups (entropy derivable with num_rows)
    """

    num_rows: int
    num_groups: int
    num_singleton_groups: int
    entropy_sum: float = 0.0

    def sum(self, other: "FrequenciesAndNumRows") -> "FrequenciesAndNumRows":
        # Only valid when the two sides cover disjoint key ranges (i.e. after
        # a hash shuffle); the runner guarantees that.
        return FrequenciesAndNumRows(
            self.num_rows + other.num_rows,
            self.num_groups + other.num_groups,
            self.num_singleton_groups + other.num_singleton_groups,
            self.entropy_sum + other.entropy_sum,
        )
