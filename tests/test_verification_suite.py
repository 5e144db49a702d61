"""Suite-level tests: end-to-end golden run, status algebra, tidy metrics
frame (reference: tests/test_sample.py, tests/test_verification_suite.py,
tests/test_analysis_runner.py)."""

import pandas as pd

import hooqu_ray as hq
from hooqu_ray.checks import Check, CheckLevel, CheckStatus
from hooqu_ray.constraints import ConstraintStatus
from hooqu_ray.runner import AnalyzerContext, do_analysis_run
from hooqu_ray.verification import VerificationSuite


def test_sample_end_to_end(sample_product_data):
    check = (
        Check(CheckLevel.ERROR, "integrity checks")
        .has_size(lambda sz: sz == 5)
        .is_complete("id")
        .is_unique("id")
        .is_complete("productName")
        .is_contained_in("priority", ("high", "low"))
        .is_non_negative("numViews")
        .contains_url("description", lambda d: d >= 0.5)
        .has_quantile("numViews", 0.5, lambda v: v <= 10)
    )
    result = VerificationSuite().on_data(sample_product_data).add_check(check).run()
    assert result.status == CheckStatus.ERROR

    failures = {
        str(r.constraint): r.metric.value.get()
        for r in next(iter(result.check_results.values())).constraint_results
        if r.status == ConstraintStatus.FAILURE
    }
    assert len(failures) == 2
    assert any(abs(v - 0.8) < 1e-12 for v in failures.values())  # productName completeness
    assert any(abs(v - 0.4) < 1e-12 for v in failures.values())  # URL match fraction


def test_overall_status_is_worst(df_comp_incomp):
    ok = Check(CheckLevel.ERROR, "ok").is_complete("att1")
    warn = Check(CheckLevel.WARNING, "warn").is_complete("att2")
    err = Check(CheckLevel.ERROR, "err").is_complete("att2")

    suite = VerificationSuite()
    assert suite.on_data(df_comp_incomp).add_check(ok).run().status == CheckStatus.SUCCESS
    assert (
        suite.on_data(df_comp_incomp).add_check(ok).add_check(warn).run().status
        == CheckStatus.WARNING
    )
    assert (
        suite.on_data(df_comp_incomp)
        .add_checks([ok, warn, err])
        .run()
        .status
        == CheckStatus.ERROR
    )
    # order invariance
    assert (
        suite.on_data(df_comp_incomp)
        .add_checks([err, ok, warn])
        .run()
        .status
        == CheckStatus.ERROR
    )


def test_empty_suite_is_success(df_full):
    assert VerificationSuite().on_data(df_full).run().status == CheckStatus.SUCCESS


def test_required_analyzers_forced(df_full):
    res = (
        VerificationSuite()
        .on_data(df_full)
        .add_required_analyzers([hq.Size(), hq.Completeness("att1")])
        .run()
    )
    assert len(res.metrics) == 2
    assert all(m.value.isSuccess for m in res.metrics.values())


def test_success_metrics_dataframe(df_full):
    ctx = do_analysis_run(
        df_full, [hq.Size(), hq.Minimum("item"), hq.Completeness("item")]
    )
    df = AnalyzerContext.success_metrics_as_dataframe(ctx)
    got = {
        (r.entity, r.instance, r.name): r.value for r in df.itertuples(index=False)
    }
    assert got[("DATASET", "*", "Size")] == 4.0
    assert got[("COLUMN", "item", "Minimum")] == 1.0
    assert got[("COLUMN", "item", "Completeness")] == 1.0


def test_missing_analysis_constraint(df_full):
    check = Check(CheckLevel.ERROR, "c").has_size(lambda s: s == 4)
    result = check.evaluate(AnalyzerContext({}))
    assert result.status == CheckStatus.ERROR
    assert "Missing Analysis" in result.constraint_results[0].message


def test_assertion_exception_wrapped(df_full):
    def boom(v):
        raise RuntimeError("boom")

    check = Check(CheckLevel.ERROR, "c").has_size(boom)
    ctx = do_analysis_run(df_full, list(check.required_analyzers()))
    result = check.evaluate(ctx)
    assert result.status == CheckStatus.ERROR
    assert "Can't execute the assertion" in result.constraint_results[0].message


def test_pandas_and_arrow_inputs_agree(df_with_numeric_values):
    import pyarrow as pa

    analyzers = [hq.Mean("att1"), hq.Uniqueness(["att2"])]
    ctx_pd = do_analysis_run(df_with_numeric_values, analyzers)
    ctx_pa = do_analysis_run(
        pa.Table.from_pandas(df_with_numeric_values, preserve_index=False), analyzers
    )
    for a in analyzers:
        assert ctx_pd.metric_map[a].value == ctx_pa.metric_map[a].value
