"""Check-builder goldens, mirroring /root/reference/hooqu/tests/test_check.py."""

import pandas as pd
import pytest

import hooqu_ray as hq
from hooqu_ray.checks import Check, CheckLevel, CheckStatus, is_one
from hooqu_ray.constraints import ConstraintStatus
from hooqu_ray.runner import do_analysis_run
from hooqu_ray.verification import VerificationSuite


def run_checks(data, *checks):
    analyzers = [a for c in checks for a in c.required_analyzers()]
    return do_analysis_run(data, analyzers)


def status_of(check, context):
    return check.evaluate(context).status


class TestCompletenessChecks:
    def test_statuses(self, df_comp_incomp):
        c1 = (
            Check(CheckLevel.ERROR, "group-1")
            .is_complete("att1")
            .has_completeness("att1", lambda v: v == 1.0)
        )
        c2 = (
            Check(CheckLevel.ERROR, "group-2-E")
            .is_complete("att2")
            .has_completeness("att1", lambda v: v > 0.8)
        )
        c3 = (
            Check(CheckLevel.WARNING, "group-2-W")
            .is_complete("att2")
            .has_completeness("att1", lambda v: v > 0.8)
        )
        ctx = run_checks(df_comp_incomp, c1, c2, c3)
        assert status_of(c1, ctx) == CheckStatus.SUCCESS
        assert status_of(c2, ctx) == CheckStatus.ERROR
        assert status_of(c3, ctx) == CheckStatus.WARNING


class TestBasicStatChecks:
    def test_goldens(self, df_with_numeric_values):
        base = Check(CheckLevel.ERROR, "a description")
        ctx = run_checks(
            df_with_numeric_values,
            base.has_min("att1", lambda v: v == 1.0),
            base.has_max("att1", lambda v: v == 6.0),
            base.has_mean("att1", lambda v: v == 3.5),
            base.has_standard_deviation("att1", lambda v: v == 1.707825127659933),
            base.has_sum("att1", lambda v: v == 21.0),
            base.has_quantile("att1", 0.5, lambda v: v == 3.0),
        )
        assert status_of(base.has_min("att1", lambda v: v == 1.0), ctx) == CheckStatus.SUCCESS
        assert status_of(base.has_max("att1", lambda v: v == 6.0), ctx) == CheckStatus.SUCCESS
        assert status_of(base.has_mean("att1", lambda v: v == 3.5), ctx) == CheckStatus.SUCCESS
        assert (
            status_of(base.has_standard_deviation("att1", lambda v: v == 1.707825127659933), ctx)
            == CheckStatus.SUCCESS
        )
        assert status_of(base.has_sum("att1", lambda v: v == 21.0), ctx) == CheckStatus.SUCCESS
        assert (
            status_of(base.has_quantile("att1", 0.5, lambda v: v == 3.0), ctx)
            == CheckStatus.SUCCESS
        )

    def test_multiple_quantiles(self, df_with_numeric_values):
        ctx = do_analysis_run(
            df_with_numeric_values,
            [hq.Quantile("att1", 0.1), hq.Quantile("att1", 0.5), hq.Quantile("att1", 0.9)],
        )
        assert len(ctx.metric_map) == 3
        base = Check(CheckLevel.ERROR, "a description")
        assert status_of(base.has_quantile("att1", 0.5, lambda v: v == 3.0), ctx) == CheckStatus.SUCCESS
        assert status_of(base.has_quantile("att1", 0.9, lambda v: v == 5.0), ctx) == CheckStatus.SUCCESS
        assert status_of(base.has_quantile("att1", 0.1, lambda v: v == 1.0), ctx) == CheckStatus.SUCCESS

    def test_mean_with_where_filter(self, df_with_numeric_values):
        plain = Check(CheckLevel.ERROR, "a").has_mean("att1", lambda v: v == 3.5)
        filtered = (
            Check(CheckLevel.ERROR, "a").has_mean("att1", lambda v: v == 5.0).where("att2 > 0")
        )
        ctx = run_checks(df_with_numeric_values, plain, filtered)
        assert status_of(plain, ctx) == CheckStatus.SUCCESS
        assert status_of(filtered, ctx) == CheckStatus.SUCCESS

    def test_size_levels(self, df_with_numeric_values):
        n = len(df_with_numeric_values)
        c1 = Check(CheckLevel.ERROR, "s1").has_size(lambda r: r == n)
        c2 = Check(CheckLevel.WARNING, "s2").has_size(lambda r: r == n)
        c3 = Check(CheckLevel.ERROR, "s3").has_size(lambda r: r != n)
        c4 = Check(CheckLevel.WARNING, "s4").has_size(lambda r: r != n)
        c5 = Check(CheckLevel.WARNING, "s5").has_size(lambda r: 0 < r < n + 1)
        ctx = run_checks(df_with_numeric_values, c1, c2, c3, c4, c5)
        assert status_of(c1, ctx) == CheckStatus.SUCCESS
        assert status_of(c2, ctx) == CheckStatus.SUCCESS
        assert status_of(c3, ctx) == CheckStatus.ERROR
        assert status_of(c4, ctx) == CheckStatus.WARNING
        assert status_of(c5, ctx) == CheckStatus.SUCCESS


class TestSatisfiesChecks:
    def test_plain(self, df_with_numeric_values):
        c1 = Check(CheckLevel.ERROR, "g1").satisfies("att1 > 0", "rule1")
        c2 = Check(CheckLevel.ERROR, "g2").satisfies("att1 > 3", "rule2")
        c3 = Check(CheckLevel.ERROR, "g3").satisfies("att1 > 3", "rule3", lambda v: v == 0.5)
        ctx = run_checks(df_with_numeric_values, c1, c2, c3)
        assert status_of(c1, ctx) == CheckStatus.SUCCESS
        assert status_of(c2, ctx) == CheckStatus.ERROR
        assert status_of(c3, ctx) == CheckStatus.SUCCESS

    def test_with_where(self, df_with_numeric_values):
        ok = Check(CheckLevel.ERROR, "g").satisfies("att1 < att2", "rule1").where("att1 > 3")
        fail = Check(CheckLevel.ERROR, "g").satisfies("att2 > 0", "rule2").where("att1 > 0")
        half = (
            Check(CheckLevel.ERROR, "g")
            .satisfies("att2 > 0", "rule3", lambda v: v == 0.5)
            .where("att1 > 0")
        )
        ctx = run_checks(df_with_numeric_values, ok, fail, half)
        assert status_of(ok, ctx) == CheckStatus.SUCCESS
        assert status_of(fail, ctx) == CheckStatus.ERROR
        assert status_of(half, ctx) == CheckStatus.SUCCESS

    def test_non_negative_positive(self, df_with_numeric_values):
        nn = Check(CheckLevel.ERROR, "a").is_non_negative("att1")
        pos = Check(CheckLevel.ERROR, "a").is_positive("att1")
        ctx = run_checks(df_with_numeric_values, nn, pos)
        assert status_of(nn, ctx) == CheckStatus.SUCCESS
        assert status_of(pos, ctx) == CheckStatus.SUCCESS

    def test_contained_in(self, df_with_distinct_values):
        ok = Check(CheckLevel.ERROR, "a").is_contained_in("att1", ("a", "b", "c"))
        bad = Check(CheckLevel.ERROR, "a").is_contained_in("att1", ("a", "b"))
        half = Check(CheckLevel.ERROR, "a").is_contained_in("att1", ("a",), lambda v: v == 0.5)
        ctx = run_checks(df_with_distinct_values, ok, bad, half)
        assert status_of(ok, ctx) == CheckStatus.SUCCESS
        assert status_of(bad, ctx) == CheckStatus.ERROR
        assert status_of(half, ctx) == CheckStatus.SUCCESS

    def test_contained_in_range(self, df_with_numeric_values):
        expectations = [
            ((0, 7, True, True), CheckStatus.SUCCESS),
            ((1, 7, True, True), CheckStatus.ERROR),
            ((0, 6, True, True), CheckStatus.ERROR),
            ((0, 7, False, False), CheckStatus.ERROR),
            ((-1, 8, False, False), CheckStatus.SUCCESS),
            ((0, 7, True, False), CheckStatus.ERROR),
            ((0, 8, True, False), CheckStatus.SUCCESS),
            ((0, 7, False, True), CheckStatus.ERROR),
            ((-1, 7, False, True), CheckStatus.SUCCESS),
        ]
        checks = [
            Check(CheckLevel.ERROR, f"nr{i}").is_contained_in_range(
                "att2", lo, hi, include_lower_bound=il, include_upper_bound=iu
            )
            for i, ((lo, hi, il, iu), _) in enumerate(expectations)
        ]
        ctx = run_checks(df_with_numeric_values, *checks)
        for check, (_, expected) in zip(checks, expectations):
            assert status_of(check, ctx) == expected


class TestUniquenessChecks:
    def test_patterns(self, df_with_unique_columns):
        check = (
            Check(CheckLevel.ERROR, "group-1-u")
            .has_uniqueness("nonUnique", lambda f: f == 0.5)
            .has_uniqueness("nonUnique", lambda f: f < 0.6)
            .has_uniqueness(
                ("halfUniqueCombinedWithNonUnique", "nonUnique"), lambda f: f == 0.5
            )
            .has_uniqueness(("onlyUniqueWithOtherNonUnique", "nonUnique"), is_one)
            .has_uniqueness("unique", is_one)
            .has_uniqueness("uniqueWithNulls", is_one)
            .has_uniqueness(("nonUnique", "halfUniqueCombinedWithNonUnique"), is_one)
            .where("nonUnique > 0")
            .has_uniqueness("halfUniqueCombinedWithNonUnique", is_one)
            .where("nonUnique > 0")
        )
        ctx = run_checks(df_with_unique_columns, check)
        result = check.evaluate(ctx)
        assert result.status == CheckStatus.SUCCESS
        assert all(
            r.status == ConstraintStatus.SUCCESS for r in result.constraint_results
        )

    def test_is_unique(self, df_with_unique_columns):
        ok = Check(CheckLevel.ERROR, "u").is_unique("unique")
        bad = Check(CheckLevel.ERROR, "u").is_unique("nonUnique")
        ctx = run_checks(df_with_unique_columns, ok, bad)
        assert status_of(ok, ctx) == CheckStatus.SUCCESS
        assert status_of(bad, ctx) == CheckStatus.ERROR


class TestPatternChecks:
    def test_email_patterns(self):
        df = pd.DataFrame({"some": ["someone@somewhere.org", "someone@else.com"]})
        check = Check(CheckLevel.ERROR, "d").has_pattern("some", hq.patterns.EMAIL)
        ctx = run_checks(df, check)
        assert status_of(check, ctx) == CheckStatus.SUCCESS

        df2 = pd.DataFrame({"some": ["someone@somewhere.org", "someone@else"]})
        ctx2 = run_checks(df2, check)
        assert status_of(check, ctx2) == CheckStatus.ERROR

    def test_url_and_cc_sugar(self):
        df = pd.DataFrame(
            {
                "urls": ["https://www.example.com/foo/?bar=baz", "https://foo.bar/baz"],
                "ccs": ["4111-1111-1111-1111", "9999999999999999"],
            }
        )
        u = Check(CheckLevel.ERROR, "d").contains_url("urls")
        c_half = Check(CheckLevel.ERROR, "d").contains_credit_card_number(
            "ccs", lambda v: v == 0.5
        )
        ctx = run_checks(df, u, c_half)
        assert status_of(u, ctx) == CheckStatus.SUCCESS
        assert status_of(c_half, ctx) == CheckStatus.SUCCESS

    def test_filtered_pattern(self):
        df = pd.DataFrame(
            [("someone@somewhere.org", "valid"), ("garbage", "invalid")],
            columns=["value", "type"],
        )
        check = (
            Check(CheckLevel.ERROR, "d")
            .has_pattern("value", hq.patterns.EMAIL)
            .where("type == 'valid'")
        )
        ctx = run_checks(df, check)
        assert status_of(check, ctx) == CheckStatus.SUCCESS


class TestSchemaChecks:
    """has_column / has_dtype: driver-side schema constraints (Deequ
    hasColumn / hasDataType — beyond the reference, which only uses
    schema as analyzer preconditions)."""

    def test_builders_on_pandas(self):
        df = pd.DataFrame({"a": [1.5, 2.0], "s": ["x", "y"],
                           "b": [True, False]})
        check = (Check(CheckLevel.ERROR, "schema")
                 .has_column("a")
                 .has_dtype("a", "numeric")
                 .has_dtype("a", "floating")
                 .has_dtype("s", "string")
                 .has_dtype("b", "boolean")
                 .has_dtype("s", "numeric", assertion=lambda v: v == 0.0))
        result = VerificationSuite().on_data(df).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS

    def test_failures_and_preconditions(self):
        df = pd.DataFrame({"a": [1, 2]})
        check = (Check(CheckLevel.ERROR, "schema-bad")
                 .has_column("missing")          # metric 0.0 -> fails
                 .has_dtype("a", "string"))      # wrong kind -> fails
        result = VerificationSuite().on_data(df).add_check(check).run()
        assert result.status == CheckStatus.ERROR
        statuses = [c.status for cr in result.check_results.values()
                    for c in cr.constraint_results]
        assert all(s == ConstraintStatus.FAILURE for s in statuses)
        # missing column on has_dtype is a Failure METRIC (precondition),
        # like every other column analyzer
        check2 = Check(CheckLevel.ERROR, "pre").has_dtype("zz", "numeric")
        r2 = VerificationSuite().on_data(df).add_check(check2).run()
        cr = list(r2.check_results.values())[0].constraint_results[0]
        assert cr.status == ConstraintStatus.FAILURE
        assert "does not include column" in (cr.message or "")

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError, match="unknown dtype kind"):
            Check(CheckLevel.ERROR, "x").has_dtype("a", "floatish")

    def test_on_ray_dataset(self, ray_session):
        import ray.data as rd
        df = pd.DataFrame({"v": [1.0, 2.0], "t": ["a", "b"]})
        check = (Check(CheckLevel.ERROR, "schema-ray")
                 .has_column("v").has_dtype("v", "numeric")
                 .has_dtype("t", "string"))
        result = (VerificationSuite().on_data(rd.from_pandas(df))
                  .add_check(check).run())
        assert result.status == CheckStatus.SUCCESS


class TestSchemaDiff:
    def test_statuses_and_type_names(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from hooqu_ray.analyzers.schema_checks import schema_diff

        a = pa.table({"id": pa.array([1], pa.int64()),
                      "x": pa.array([1.0], pa.float64()),
                      "gone": pa.array(["g"], pa.string())})
        b = pa.table({"id": pa.array([1], pa.int32()),   # narrowed
                      "x": pa.array([1.0], pa.float64()),
                      "new": pa.array([b"z"], pa.binary())})
        out = schema_diff(rd.from_arrow(a), rd.from_arrow(b)).to_pydict()
        rows = dict(zip(out["col"], zip(out["status"], out["dtype_a"],
                                        out["dtype_b"])))
        assert rows["id"] == ("changed", "BIGINT", "INTEGER")
        assert rows["x"] == ("unchanged", "DOUBLE", "DOUBLE")
        assert rows["gone"] == ("removed", "VARCHAR", None)
        assert rows["new"] == ("added", None, "BLOB")

    def test_accepts_tables_schemas_and_lists(self):
        import pyarrow as pa
        from hooqu_ray.analyzers.schema_checks import schema_diff, sql_type_name

        assert sql_type_name(pa.list_(pa.float32())) == "FLOAT[]"
        assert sql_type_name(pa.timestamp("us")) == "TIMESTAMP"
        out = schema_diff(pa.schema([("a", pa.int64())]),
                          pa.table({"a": pa.array([2], pa.int64())}))
        assert out.column("status").to_pylist() == ["unchanged"]

    def test_same_sql_name_different_arrow_type_flags(self):
        import pyarrow as pa
        from hooqu_ray.analyzers.schema_checks import schema_diff

        # ns -> us renders as TIMESTAMP on both sides yet must flag
        out = schema_diff(pa.schema([("ts", pa.timestamp("ns"))]),
                          pa.schema([("ts", pa.timestamp("us"))]))
        assert out.column("status").to_pylist() == ["changed"]
        assert out.column("dtype_a").to_pylist() == ["TIMESTAMP"]
        assert out.column("dtype_b").to_pylist() == ["TIMESTAMP"]

    def test_pandas_input(self):
        from hooqu_ray.analyzers.schema_checks import schema_diff

        a = pd.DataFrame({"x": [1], "y": ["s"]})
        b = pd.DataFrame({"x": [1.5]})
        out = schema_diff(a, b).to_pydict()
        rows = dict(zip(out["col"], out["status"]))
        assert rows == {"x": "changed", "y": "removed"}
