"""Anomaly detection over the metrics repository.

Deequ's ``addAnomalyCheck`` surface, which the pandas reference never
reached (its MetricsRepository itself was only planned —
``/root/reference/README.rst:154-157``): a strategy judges the CURRENT
value of one metric against that metric's history loaded from a
``FileSystemMetricsRepository``, so a quality pipeline can gate not just on
absolute thresholds but on drift between runs ("row count dropped 40%
since yesterday").

All strategies are pure functions of ``(history_values, current_value)``;
history is ordered by ``dataset_ts`` ascending.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence


@dataclass(frozen=True)
class AnomalyResult:
    is_anomalous: bool
    value: float
    baseline: Optional[float]  # what the strategy compared against
    detail: str


@dataclass(frozen=True)
class AbsoluteChangeStrategy:
    """Anomalous when ``value - last`` leaves [-max_decrease, +max_increase]
    (None = unbounded on that side)."""

    max_decrease: Optional[float] = None
    max_increase: Optional[float] = None

    def evaluate(self, history: Sequence[float], value: float) -> AnomalyResult:
        if not history:
            return AnomalyResult(False, value, None, "no history")
        last = history[-1]
        delta = value - last
        bad = (
            self.max_decrease is not None and delta < -self.max_decrease
        ) or (self.max_increase is not None and delta > self.max_increase)
        return AnomalyResult(bad, value, last, f"delta={delta:+g} vs last={last:g}")


@dataclass(frozen=True)
class RelativeRateOfChangeStrategy:
    """Anomalous when the DIRECTED relative change leaves
    [min_rate, max_rate], with ``rate = 1 + (value - last) / |last|`` —
    identical to ``value / last`` for a positive baseline, but keeping
    increase/decrease semantics intact for a negative one (a plain ratio
    flips direction there: last=-0.5 → value=-0.25 is an INCREASE, yet
    value/last = 0.5 looks like a drop).  None = unbounded on that side;
    a zero baseline with a nonzero value is anomalous whenever a bound is
    set."""

    min_rate: Optional[float] = None
    max_rate: Optional[float] = None

    def evaluate(self, history: Sequence[float], value: float) -> AnomalyResult:
        if not history:
            return AnomalyResult(False, value, None, "no history")
        last = history[-1]
        if last == 0:
            bad = value != 0 and (self.min_rate is not None or self.max_rate is not None)
            return AnomalyResult(bad, value, last, "zero baseline")
        rate = 1.0 + (value - last) / abs(last)
        bad = (self.min_rate is not None and rate < self.min_rate) or (
            self.max_rate is not None and rate > self.max_rate
        )
        return AnomalyResult(bad, value, last, f"rate={rate:g} vs last={last:g}")


@dataclass(frozen=True)
class OnlineNormalStrategy:
    """Anomalous when the value sits more than ``n_sigmas`` population
    standard deviations from the history mean; needs ``min_history``
    points (constant histories use ``min_std`` as the deviation floor)."""

    n_sigmas: float = 3.0
    min_history: int = 3
    min_std: float = 1e-12

    def evaluate(self, history: Sequence[float], value: float) -> AnomalyResult:
        if len(history) < self.min_history:
            return AnomalyResult(False, value, None, "insufficient history")
        mean = sum(history) / len(history)
        var = sum((x - mean) ** 2 for x in history) / len(history)
        std = max(math.sqrt(var), self.min_std)
        z = (value - mean) / std
        return AnomalyResult(
            abs(z) > self.n_sigmas, value, mean, f"z={z:g} (mean={mean:g}, std={std:g})"
        )


def metric_history(repository, name: str, instance: str,
                   tags: Optional[dict] = None) -> List[float]:
    """Successful values of one metric across stored runs, ordered by
    ``dataset_ts`` ascending.  ``tags`` restricts the history to runs whose
    ResultKey carried every given tag value — without it, runs of DIFFERENT
    tagged datasets sharing one repository would merge into one series and
    produce false (or masked) anomalies."""
    df = repository.history()
    if len(df) == 0:
        return []
    sel = df[(df["name"] == name) & (df["instance"] == instance) & df["success"]]
    for k, v in (tags or {}).items():
        if k not in sel.columns:
            return []
        sel = sel[sel[k] == v]
    return sel.sort_values("dataset_ts")["value"].astype(float).tolist()


def check_anomaly(repository, analyzer, context, strategy,
                  tags: Optional[dict] = None) -> AnomalyResult:
    """Judge the CURRENT run's metric for ``analyzer`` (taken from
    ``context``) against its repository history (restricted to runs
    matching ``tags``).  The current run must not be saved to the
    repository yet (or its value will judge itself)."""
    metric = context.metric_map.get(analyzer)
    if metric is None or not metric.value.isSuccess:
        return AnomalyResult(True, float("nan"), None, "metric missing or failed")
    value = float(metric.value.get())
    history = metric_history(repository, metric.name, metric.instance, tags)
    return strategy.evaluate(history, value)
