"""Single-constraint micro path (reference: tests/test_constraint.py) —
``AnalysisBasedConstraint.calculate_and_evaluate`` computes one analyzer's
metric and runs one assertion in isolation."""

import pandas as pd

import hooqu_ray as hq
from hooqu_ray.constraints import (
    AnalysisBasedConstraint,
    ConstraintDecorator,
    ConstraintStatus,
    named_analysis_constraint,
)


def calculate(constraint, df):
    if isinstance(constraint, ConstraintDecorator):
        constraint = constraint.inner
    assert isinstance(constraint, AnalysisBasedConstraint)
    return constraint.calculate_and_evaluate(df)


def c(kind, analyzer, assertion):
    return named_analysis_constraint(kind, analyzer, assertion)


def test_completeness_constraint(df_missing):
    df = df_missing
    ok = calculate(c("Completeness", hq.Completeness("att1"), lambda v: v == 0.5), df)
    assert ok.status == ConstraintStatus.SUCCESS
    bad = calculate(c("Completeness", hq.Completeness("att1"), lambda v: v != 0.5), df)
    assert bad.status == ConstraintStatus.FAILURE
    assert calculate(
        c("Completeness", hq.Completeness("att2"), lambda v: v == 0.75), df
    ).status == ConstraintStatus.SUCCESS


def test_basic_stats_constraints(df_with_numeric_values):
    df = df_with_numeric_values
    cases = [
        ("Minimum", hq.Minimum("att1"), lambda v: v == 1.0),
        ("Maximum", hq.Maximum("att1"), lambda v: v == 6.0),
        ("Mean", hq.Mean("att1"), lambda v: v == 3.5),
        ("Sum", hq.Sum("att1"), lambda v: v == 21.0),
        ("StandardDeviation", hq.StandardDeviation("att1"), lambda v: v == 1.707825127659933),
        ("Quantile", hq.Quantile("att1", 0.5), lambda v: v == 3.0),
    ]
    for kind, analyzer, assertion in cases:
        assert calculate(c(kind, analyzer, assertion), df).status == ConstraintStatus.SUCCESS, kind


def test_size_constraint(df_missing):
    res = calculate(c("Size", hq.Size(), lambda v: v == len(df_missing)), df_missing)
    assert res.status == ConstraintStatus.SUCCESS


def test_compliance_constraint(df_with_numeric_values):
    df = df_with_numeric_values
    assert calculate(
        c("Compliance", hq.Compliance("rule1", "att1 > 2 "), lambda p: p >= 0.6), df
    ).status == ConstraintStatus.SUCCESS
    assert calculate(
        c("Compliance", hq.Compliance("rule1", "att1 > 2 "), lambda p: p >= 0.9), df
    ).status == ConstraintStatus.FAILURE


def test_uniqueness_constraint():
    df_nunique = pd.DataFrame({"att1": [0, 1, 2, 5, 5]})
    df_unique = pd.DataFrame({"att1": range(0, 10)})
    assert calculate(
        c("Uniqueness", hq.Uniqueness(["att1"]), lambda v: v > 0.2), df_nunique
    ).status == ConstraintStatus.SUCCESS
    assert calculate(
        c("Uniqueness", hq.Uniqueness(["att1"]), lambda v: v == 1.0), df_nunique
    ).status == ConstraintStatus.FAILURE
    assert calculate(
        c("Uniqueness", hq.Uniqueness(["att1"]), lambda v: v == 1.0), df_unique
    ).status == ConstraintStatus.SUCCESS


def test_assertion_must_be_callable():
    import pytest

    with pytest.raises(ValueError):
        named_analysis_constraint("Size", hq.Size(), "not callable")


def test_value_picker_applied_before_assertion(df_with_numeric_values):
    """Reference surface parity: value_picker (declared, unwired in
    /root/reference/hooqu/constraints/analysis_based_constraint.py:47-51)
    maps the metric's Success value before the assertion sees it."""
    df = df_with_numeric_values
    # picker doubles the mean (3.5 -> 7.0); assertion checks the PICKED value
    ok = calculate(
        named_analysis_constraint(
            "Mean", hq.Mean("att1"), lambda v: v == 7.0,
            value_picker=lambda m: m * 2), df)
    assert ok.status == ConstraintStatus.SUCCESS
    # without the picker the same assertion fails (value stays 3.5)
    bad = calculate(
        named_analysis_constraint("Mean", hq.Mean("att1"), lambda v: v == 7.0), df)
    assert bad.status == ConstraintStatus.FAILURE


def test_value_picker_exception_fails_like_assertion(df_with_numeric_values):
    df = df_with_numeric_values
    res = calculate(
        named_analysis_constraint(
            "Mean", hq.Mean("att1"), lambda v: True,
            value_picker=lambda m: 1 / 0), df)
    assert res.status == ConstraintStatus.FAILURE
    assert "Can't execute the assertion" in res.message


def test_value_picker_skipped_on_failure_metric():
    # a missing column yields a Failure metric; the picker must NOT run
    # (reference applies pickers to Success values only)
    df = pd.DataFrame({"other": [1, 2, 3]})
    calls = []

    def picker(m):
        calls.append(m)
        return m

    res = calculate(
        named_analysis_constraint(
            "Mean", hq.Mean("att1"), lambda v: True, value_picker=picker), df)
    assert res.status == ConstraintStatus.FAILURE
    assert calls == []
