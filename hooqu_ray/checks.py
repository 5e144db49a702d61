"""Fluent Check builder — the reference's full public surface
(``hooqu/checks.py``, 752 LoC) re-expressed compactly.

Every builder appends a constraint and returns a
``CheckWithLastConstraintFilterable`` so a trailing ``.where(filter)``
rebuilds the last constraint with the filter applied
(reference: checks.py:83-97, 713-752)."""

from __future__ import annotations

import numbers
from dataclasses import dataclass, field
from enum import Enum, IntEnum
from typing import Any, Callable, List, Optional, Pattern, Sequence, Set, Tuple, Union

from . import patterns
from .analyzers.base import Analyzer
from .analyzers.grouping import (
    CountDistinct,
    Distinctness,
    Entropy,
    MutualInformation,
    UniqueValueRatio,
    Uniqueness,
)
from .analyzers.quantile import Quantile
from .analyzers.scan import (
    Completeness,
    Compliance,
    Correlation,
    Maximum,
    MaxLength,
    Mean,
    Minimum,
    MinLength,
    PatternMatch,
    Size,
    StandardDeviation,
    Sum,
)
from .analyzers.sketches import ApproxCountDistinct, ApproxQuantile
from .constraints import (
    AnalysisBasedConstraint,
    Constraint,
    ConstraintDecorator,
    ConstraintResult,
    ConstraintStatus,
    named_analysis_constraint,
)

Assertion = Callable[[float], bool]


class CheckLevel(Enum):
    WARNING = 0
    ERROR = 1


class CheckStatus(IntEnum):
    SUCCESS = 0
    WARNING = 1
    ERROR = 2


def is_one(value: Union[float, int]) -> bool:
    return value == 1


@dataclass(frozen=True, eq=True)
class CheckResult:
    check: Any
    status: CheckStatus
    constraint_results: Sequence[ConstraintResult] = field(default_factory=tuple)


@dataclass(frozen=True, eq=True)
class Check:
    level: CheckLevel
    description: str
    constraints: Tuple[Constraint, ...] = field(default_factory=tuple)

    # -- plumbing -----------------------------------------------------------

    def add_constraint(self, constraint: Constraint) -> "Check":
        return Check(self.level, self.description, self.constraints + (constraint,))

    def _add_filterable(
        self, creation: Callable[[Optional[str]], Constraint]
    ) -> "CheckWithLastConstraintFilterable":
        return CheckWithLastConstraintFilterable(
            self.level, self.description, self.constraints + (creation(None),), creation
        )

    def required_analyzers(self) -> Set[Analyzer]:
        unwrapped = (
            c.inner if isinstance(c, ConstraintDecorator) else c for c in self.constraints
        )
        return {
            c.analyzer for c in unwrapped if isinstance(c, AnalysisBasedConstraint)
        }

    def evaluate(self, context) -> CheckResult:
        """Worst-status-wins roll-up (reference: checks.py:687-710)."""
        results = [c.evaluate(context.metric_map) for c in self.constraints]
        failed = any(r.status == ConstraintStatus.FAILURE for r in results)
        if not failed:
            status = CheckStatus.SUCCESS
        elif self.level == CheckLevel.ERROR:
            status = CheckStatus.ERROR
        else:
            status = CheckStatus.WARNING
        return CheckResult(self, status, results)

    # -- constraint builders (reference: checks.py:114-685) -----------------

    def has_column(self, column: str, hint: Optional[str] = None):
        """Schema check (Deequ hasColumn): the column must exist — resolved
        on the driver from Dataset.schema(), zero data passes."""
        from .analyzers.schema_checks import ColumnExists

        return self.add_constraint(named_analysis_constraint(
            "ColumnExists", ColumnExists(column), is_one, hint))

    def has_dtype(self, column: str, kind: str,
                  assertion: Assertion = None,
                  hint: Optional[str] = None):
        """Schema check (Deequ hasDataType): the column's Arrow type must
        belong to ``kind`` (numeric/integer/floating/string/boolean/
        temporal/binary/list).  Default assertion: it does (metric 1.0).
        Driver-side, zero data passes."""
        from .analyzers.schema_checks import ColumnDtype

        return self.add_constraint(named_analysis_constraint(
            "ColumnDtype", ColumnDtype(column, kind),
            assertion if assertion is not None else is_one, hint))

    def has_size(self, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint("Size", Size(f), assertion, hint)
        )

    def has_min(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint("Minimum", Minimum(column, f), assertion, hint)
        )

    def has_max(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint("Maximum", Maximum(column, f), assertion, hint)
        )

    def is_complete(self, column: str, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Completeness", Completeness(column, f), is_one, hint
            )
        )

    def has_completeness(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Completeness", Completeness(column, f), assertion, hint
            )
        )

    def has_min_length(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        """Extension: minimum string length."""
        return self._add_filterable(
            lambda f: named_analysis_constraint("MinLength", MinLength(column, f), assertion, hint)
        )

    def has_max_length(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        """Extension: maximum string length."""
        return self._add_filterable(
            lambda f: named_analysis_constraint("MaxLength", MaxLength(column, f), assertion, hint)
        )

    def has_mean(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint("Mean", Mean(column, f), assertion, hint)
        )

    def has_standard_deviation(
        self, column: str, assertion: Assertion, hint: Optional[str] = None
    ):
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "StandardDeviation", StandardDeviation(column, f), assertion, hint
            )
        )

    def has_sum(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint("Sum", Sum(column, f), assertion, hint)
        )

    def has_quantile(
        self, column: str, quantile: float, assertion: Assertion, hint: Optional[str] = None
    ):
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Quantile", Quantile(column, quantile, f), assertion, hint
            )
        )

    def has_approx_quantile(
        self, column: str, quantile: float, assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: sketch-based quantile for the 100TB path."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "ApproxQuantile", ApproxQuantile(column, quantile, f), assertion, hint
            )
        )

    def has_approx_count_distinct(
        self, column: str, assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: HLL distinct-count estimate."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "ApproxCountDistinct", ApproxCountDistinct(column, f), assertion, hint
            )
        )

    def satisfies(
        self,
        column_condition: str,
        constraint_name: str,
        assertion: Assertion = is_one,
        hint: Optional[str] = None,
    ):
        """Arbitrary predicate compliance (reference: checks.py:341-375)."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Compliance",
                Compliance(constraint_name, column_condition, f),
                assertion,
                hint,
            )
        )

    def is_non_negative(
        self, column: str, assertion: Assertion = is_one, hint: Optional[str] = None
    ):
        # null-coalescing so nulls don't count as non-compliant (checks.py:377-403)
        return self.satisfies(
            f"`{column}`.fillna(0) >= 0", f"{column} is non-negative", assertion, hint=hint
        )

    def is_positive(
        self, column: str, assertion: Assertion = is_one, hint: Optional[str] = None
    ):
        return self.satisfies(
            f"`{column}`.fillna(1.0) > 0", f"{column} is positive", assertion, hint=hint
        )

    def is_contained_in(
        self,
        column: str,
        allowed_values: Sequence[Union[str, int]],
        assertion: Assertion = is_one,
        hint: Optional[str] = None,
    ):
        values = list(allowed_values)
        if not values:
            raise ValueError("Empty list of allowed values used")
        all_int = all(isinstance(v, numbers.Integral) for v in values)
        if not isinstance(values[0], str) and not all_int:
            raise ValueError(
                "The type of allowed values should be string or integer but got"
                f" '{type(values[0])}'"
            )
        predicate = f"`{column}`.isna() or `{column}`.isin({values!r})"
        return self.satisfies(predicate, f"{column} contained in {values}", assertion, hint)

    def is_contained_in_range(
        self,
        column: str,
        lower_bound: float,
        upper_bound: float,
        include_lower_bound: bool = True,
        include_upper_bound: bool = True,
        hint: Optional[str] = None,
    ):
        lop = ">=" if include_lower_bound else ">"
        rop = "<=" if include_upper_bound else "<"
        predicate = (
            f"`{column}`.isna() or "
            f"(`{column}` {lop} {lower_bound}  and `{column}` {rop} {upper_bound})"
        )
        return self.satisfies(
            predicate, f"{column} between {lower_bound} and {upper_bound}", hint=hint
        )

    def is_unique(self, column: str, hint: Optional[str] = None):
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Uniqueness", Uniqueness([column], f), is_one, hint
            )
        )

    def has_uniqueness(
        self, columns: Union[str, Sequence[str]], assertion: Assertion, hint: Optional[str] = None
    ):
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Uniqueness", Uniqueness(cols, f), assertion, hint
            )
        )

    def has_distinctness(
        self, columns: Union[str, Sequence[str]], assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: fraction of distinct value groups."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Distinctness", Distinctness(cols, f), assertion, hint
            )
        )

    def has_unique_value_ratio(
        self, columns: Union[str, Sequence[str]], assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: singleton groups / distinct groups."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "UniqueValueRatio", UniqueValueRatio(cols, f), assertion, hint
            )
        )

    def has_number_of_distinct_values(
        self, column: str, assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: exact distinct count."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "CountDistinct", CountDistinct([column], f), assertion, hint
            )
        )

    def has_entropy(self, column: str, assertion: Assertion, hint: Optional[str] = None):
        """Extension: Shannon entropy of the value distribution."""
        return self._add_filterable(
            lambda f: named_analysis_constraint("Entropy", Entropy([column], f), assertion, hint)
        )

    def has_mutual_information(
        self, column_a: str, column_b: str, assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: mutual information (nats) between two columns."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "MutualInformation", MutualInformation([column_a, column_b], f), assertion, hint
            )
        )

    def has_correlation(
        self, column_a: str, column_b: str, assertion: Assertion, hint: Optional[str] = None
    ):
        """Extension: Pearson correlation between two numeric columns."""
        return self._add_filterable(
            lambda f: named_analysis_constraint(
                "Correlation", Correlation(column_a, column_b, f), assertion, hint
            )
        )

    def has_pattern(
        self,
        column: str,
        pattern: Union[str, Pattern],
        assertion: Assertion = is_one,
        name: Optional[str] = None,
        hint: Optional[str] = None,
    ):
        def create(f: Optional[str]) -> Constraint:
            analyzer = PatternMatch(column, pattern, f)
            cname = (
                f"PatternMatchConstraint({name})"
                if name
                else f"PatternMatchConstraint({column}, {analyzer.pattern_str})"
            )
            return named_analysis_constraint("PatternMatch", analyzer, assertion, hint, name=cname)

        return self._add_filterable(create)

    def contains_credit_card_number(self, column: str, assertion: Assertion = is_one):
        return self.has_pattern(
            column, patterns.CREDITCARD, assertion, name=f"containsCreditCardNumber({column})"
        )

    def contains_email(self, column: str, assertion: Assertion = is_one):
        return self.has_pattern(column, patterns.EMAIL, assertion, name=f"containsEmail({column})")

    def contains_url(self, column: str, assertion: Assertion = is_one):
        return self.has_pattern(column, patterns.URL, assertion, name=f"containsURL({column})")


class CheckWithLastConstraintFilterable(Check):
    def __init__(
        self,
        level: CheckLevel,
        description: str,
        constraints: Tuple[Constraint, ...],
        create_replacement: Callable[[Optional[str]], Constraint],
    ):
        super().__init__(level, description, constraints)
        object.__setattr__(self, "create_replacement", create_replacement)

    def where(self, query: Optional[str]) -> Check:
        """Apply a filter to the previous constraint (checks.py:724-739)."""
        adjusted = self.constraints[:-1] + (self.create_replacement(query),)
        return Check(self.level, self.description, adjusted)
