"""Constraints: assertions over computed metrics.

Semantics pinned to the reference (``hooqu/constraints/``): a constraint
holds an analyzer + a user assertion; evaluation fetches the analyzer's
metric from the run context ("Missing Analysis" failure when absent),
translates Failure metrics into FAILURE results with the exception text, and
wraps assertion exceptions (``analysis_based_constraint.py:59-108``).

Rather than the reference's twelve near-identical factory functions
(``constraints/constraints.py:32-271``) we use one generic factory
parameterized by the analyzer."""

from __future__ import annotations

from dataclasses import dataclass, replace
from enum import Enum
from typing import Any, Callable, Mapping, Optional

from .analyzers.base import Analyzer
from .metrics import DoubleMetric, Success

_MISSING_ANALYSIS_MSG = "Missing Analysis, can't run the constraint!"
_ASSERTION_EXCEPTION_MSG = "Can't execute the assertion"


class ConstraintStatus(Enum):
    SUCCESS = 0
    FAILURE = 1


class Constraint:
    def evaluate(self, analysis_result: Mapping[Analyzer, DoubleMetric]) -> "ConstraintResult":
        raise NotImplementedError


@dataclass
class ConstraintResult:
    constraint: Constraint
    status: ConstraintStatus
    message: Optional[str] = None
    metric: Optional[DoubleMetric] = None


class ConstraintAssertionException(Exception):
    pass


class AnalysisBasedConstraint(Constraint):
    """Assertion over one analyzer's metric value."""

    def __init__(
        self,
        analyzer: Analyzer,
        assertion: Callable[[Any], bool],
        value_picker: Optional[Callable[[Any], Any]] = None,
        hint: Optional[str] = None,
    ):
        """``value_picker`` (optional) maps the metric's Success value to the
        value the assertion sees — the reference declares this hook but never
        wires it (analysis_based_constraint.py:47-51, the "TODO:
        run_picker_on_metric"); we implement the declared semantics: picker
        applies only to Success metrics, before the assertion, and a raising
        picker fails the constraint like a raising assertion."""
        self.analyzer = analyzer
        self._assertion = assertion
        self._value_picker = value_picker
        self._hint = hint

    def calculate_and_evaluate(self, data) -> ConstraintResult:
        from .runner import do_analysis_run

        context = do_analysis_run(data, [self.analyzer])
        return self.evaluate(context.metric_map)

    def evaluate(self, analysis_result: Mapping[Analyzer, DoubleMetric]) -> ConstraintResult:
        metric = analysis_result.get(self.analyzer)
        if metric is None:
            return ConstraintResult(self, ConstraintStatus.FAILURE, _MISSING_ANALYSIS_MSG, None)
        if not isinstance(metric.value, Success):
            ex = metric.value.failed().get()
            return ConstraintResult(self, ConstraintStatus.FAILURE, str(ex), metric)
        value = metric.value.get()
        try:
            if self._value_picker is not None:
                value = self._run_picker(value)
            ok = self._run_assertion(value)
        except ConstraintAssertionException as ex:
            return ConstraintResult(
                self, ConstraintStatus.FAILURE, f"{_ASSERTION_EXCEPTION_MSG}: {ex}", metric
            )
        if ok:
            return ConstraintResult(self, ConstraintStatus.SUCCESS, metric=metric)
        hint = self._hint or ""
        msg = f"Value {value} does not meet the constraint requirement. {hint}"
        return ConstraintResult(self, ConstraintStatus.FAILURE, msg, metric)

    def _run_assertion(self, value) -> bool:
        try:
            return self._assertion(value)
        except Exception as ex:  # noqa: BLE001
            raise ConstraintAssertionException(ex) from ex

    def _run_picker(self, value):
        try:
            return self._value_picker(value)
        except Exception as ex:  # noqa: BLE001
            raise ConstraintAssertionException(ex) from ex


class ConstraintDecorator(Constraint):
    def __init__(self, inner: Constraint):
        self._inner = inner

    @property
    def inner(self) -> Constraint:
        return self._inner.inner if isinstance(self._inner, ConstraintDecorator) else self._inner

    def evaluate(self, analysis_result) -> ConstraintResult:
        return replace(self._inner.evaluate(analysis_result), constraint=self)


class NamedConstraint(ConstraintDecorator):
    def __init__(self, constraint: Constraint, name: str):
        super().__init__(constraint)
        self.name = name
        self.constraint = constraint

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return self.name

    def __hash__(self) -> int:
        return hash(self.constraint) ^ hash(self.name)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, NamedConstraint)
            and self.name == other.name
            and self.constraint is other.constraint
        )


def named_analysis_constraint(
    kind: str,
    analyzer: Analyzer,
    assertion: Callable[[Any], bool],
    hint: Optional[str] = None,
    name: Optional[str] = None,
    value_picker: Optional[Callable[[Any], Any]] = None,
) -> Constraint:
    """Generic factory covering all of the reference's constraint builders
    (constraints/constraints.py:32-271): wraps analyzer+assertion and names
    the constraint ``{Kind}Constraint({analyzer!r})``."""
    if not callable(assertion):
        raise ValueError("assertion is not a callable")
    inner = AnalysisBasedConstraint(analyzer, assertion,
                                    value_picker=value_picker, hint=hint)
    return NamedConstraint(inner, name or f"{kind}Constraint({analyzer!r})")
