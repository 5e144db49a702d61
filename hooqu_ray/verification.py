"""VerificationSuite: run checks, roll statuses up, keep all metrics.

Reference: ``hooqu/verification_suite.py``.  Works identically over a
``ray.data.Dataset`` (distributed shared scan) or a pandas DataFrame /
pyarrow Table (local chunked fold) — the data type picks the backend in
``runner.do_analysis_run``."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Mapping, Optional, Sequence, Tuple

from .analyzers.base import Analyzer
from .checks import Check, CheckResult, CheckStatus
from .metrics import DoubleMetric
from .runner import AnalyzerContext, do_analysis_run


@dataclass
class VerificationResult:
    status: CheckStatus
    check_results: Mapping[Check, CheckResult]
    metrics: Mapping[Analyzer, DoubleMetric]


class VerificationRunBuilder:
    def __init__(self, data: Any):
        self._data = data
        self._checks: List[Check] = []
        self._required: Tuple[Analyzer, ...] = ()

    def add_check(self, check: Check) -> "VerificationRunBuilder":
        self._checks.append(check)
        return self

    def add_checks(self, checks: Sequence[Check]) -> "VerificationRunBuilder":
        self._checks.extend(checks)
        return self

    def add_required_analyzers(self, analyzers: Sequence[Analyzer]) -> "VerificationRunBuilder":
        self._required = self._required + tuple(analyzers)
        return self

    def run(self) -> VerificationResult:
        return VerificationSuite().do_verification_run(
            self._data, self._checks, self._required
        )


class VerificationSuite:
    def __init__(self) -> None:
        self._checks: List[Check] = []
        self._required: Tuple[Analyzer, ...] = ()

    def add_check(self, check: Check) -> "VerificationSuite":
        self._checks.append(check)
        return self

    def add_checks(self, checks: Sequence[Check]) -> "VerificationSuite":
        self._checks.extend(checks)
        return self

    def on_data(self, data: Any) -> VerificationRunBuilder:
        return VerificationRunBuilder(data)

    def run(self, data: Any) -> VerificationResult:
        return self.do_verification_run(data, self._checks, self._required)

    def do_verification_run(
        self,
        data: Any,
        checks: Sequence[Check],
        required_analyzers: Optional[Tuple[Analyzer, ...]] = None,
    ) -> VerificationResult:
        """One shared pass computes every analyzer required by every check
        (dedup included — reference verification_suite.py:155-160); then each
        check's constraints are evaluated driver-side against the metric map."""
        required = tuple(required_analyzers or ())
        analyzers = required + tuple(
            a for check in checks for a in check.required_analyzers()
        )
        context = do_analysis_run(data, analyzers)
        return self.evaluate(checks, context)

    def evaluate(
        self, checks: Sequence[Check], context: AnalyzerContext
    ) -> VerificationResult:
        check_results = {c: c.evaluate(context) for c in checks}
        status = (
            max(r.status for r in check_results.values())
            if check_results
            else CheckStatus.SUCCESS
        )
        return VerificationResult(status, check_results, context.metric_map)
