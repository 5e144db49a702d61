"""Predicate mini-language: differential tests vs pandas query/eval, plus
fallback-path coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import hooqu_ray as hq
from hooqu_ray.functions.expr import (
    ExprCompileError,
    PandasPredicate,
    Predicate,
    compile_predicate,
)
from hooqu_ray.runner import do_analysis_run


def frame():
    return pd.DataFrame(
        {
            "a": [1, 2, 3, 4, 5, 6],
            "b": [0.5, None, 2.5, None, 4.5, 5.5],
            "s": ["x", "y", None, "x", "z", "y"],
        }
    )


FILTER_EXPRS = [
    "a > 3",
    "a >= 2 and a <= 5",
    "a == 1 or a == 2",
    "not (a > 3)",
    "b > 1",                      # nulls drop in both engines
    "s == 'x'",
    "s != 'x'",                   # pandas: None != 'x' is True; arrow: null → dropped (see below)
    "a + 1 > 4",
    "a * 2 <= 8",
    "a / 2 > 1.5",
    "1 < a < 4",
    "`a` > 3",
    "a in [1, 2, 3]",
    "a not in [1, 2]",
]


@pytest.mark.parametrize("expr", FILTER_EXPRS)
def test_filter_matches_pandas_query(expr):
    df = frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate(expr, table.schema)
    got = pred.filter(table).column("a").to_pylist()
    expected = df.query(expr)["a"].tolist()
    if expr == "s != 'x'":
        # documented divergence: pandas object-!=-literal keeps None rows;
        # Arrow's null semantics drop them (null -> no match). The analyzers
        # never rely on != over null strings; pin current behavior.
        assert got == [2, 5, 6]
        return
    assert got == expected, expr


METHOD_EXPRS = [
    ("`b`.isna()", lambda df: df["b"].isna()),
    ("`b`.notna()", lambda df: df["b"].notna()),
    ("`s`.isin(['x', 'y'])", lambda df: df["s"].isin(["x", "y"])),
    ("`b`.fillna(0) >= 0", lambda df: df["b"].fillna(0) >= 0),
    ("`b`.fillna(1.0) > 0", lambda df: df["b"].fillna(1.0) > 0),
    ("`s`.isna() or `s`.isin(['x'])", lambda df: df["s"].isna() | df["s"].isin(["x"])),
]


@pytest.mark.parametrize("expr,oracle", METHOD_EXPRS)
def test_methods_match_pandas(expr, oracle):
    df = frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate(expr, table.schema)
    mask = pred.mask(table)
    got = [bool(v) if v is not None else False for v in mask.to_pylist()]
    assert got == oracle(df).tolist(), expr


def test_numeric_string_literal_coercion():
    # pinned reference-CI behavior: "item != '6'" on an int column excludes 6
    df = pd.DataFrame({"item": [1, 2, 6]})
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("item != '6'", table.schema)
    assert pred.filter(table).column("item").to_pylist() == [1, 2]


def test_missing_column_raises():
    table = pa.Table.from_pandas(frame(), preserve_index=False)
    with pytest.raises(ExprCompileError):
        compile_predicate("nosuch > 1", table.schema)


def test_unsupported_syntax_falls_back_to_pandas():
    table = pa.Table.from_pandas(frame(), preserve_index=False)
    pred = compile_predicate("a % 2 == 0", table.schema)  # % unsupported → fallback
    assert isinstance(pred, PandasPredicate)
    assert pred.filter(table).column("a").to_pylist() == [2, 4, 6]


def test_pandas_fallback_through_runner():
    df = frame()
    a = hq.Compliance("even", "a % 2 == 0")
    ctx = do_analysis_run(df, [a], chunk_rows=2)
    assert ctx.metric_map[a].value.get() == 0.5

    filtered = hq.Mean("a", where="a % 2 == 0")
    ctx2 = do_analysis_run(df, [filtered], chunk_rows=2)
    assert ctx2.metric_map[filtered].value.get() == 4.0


def test_predicate_pickles():
    import pickle

    table = pa.Table.from_pandas(frame(), preserve_index=False)
    pred = compile_predicate("a > 3 and `b`.notna()", table.schema)
    pred2 = pickle.loads(pickle.dumps(pred))
    assert pred2.filter(table).column("a").to_pylist() == pred.filter(table).column("a").to_pylist()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
    st.integers(min_value=-50, max_value=50),
    st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
)
def test_comparison_differential(values, threshold, op):
    df = pd.DataFrame({"v": values})
    table = pa.Table.from_pandas(df, preserve_index=False)
    expr = f"v {op} {threshold}"
    pred = compile_predicate(expr, table.schema)
    got = pred.filter(table).num_rows
    assert got == len(df.query(expr))


# -- temporal surface (VERDICT r3 item 8) -----------------------------------

DT_FIELD_EXPRS = [
    ("ts.dt.year == 2024", lambda df: df.ts.dt.year == 2024),
    ("ts.dt.month >= 6", lambda df: df.ts.dt.month >= 6),
    ("ts.dt.day < 15", lambda df: df.ts.dt.day < 15),
    ("ts.dt.hour in [0, 6, 12]", lambda df: df.ts.dt.hour.isin([0, 6, 12])),
    # != over NaT: pandas yields True (NaN != 30); Arrow null drops — the
    # same documented divergence the "s != 'x'" filter test pins
    ("ts.dt.minute != 30",
     lambda df: (df.ts.dt.minute != 30) & df.ts.notna()),
    ("ts.dt.second <= 59", lambda df: df.ts.dt.second <= 59),
    ("ts.dt.dayofweek < 5", lambda df: df.ts.dt.dayofweek < 5),  # weekdays
    ("ts.dt.weekday == 0", lambda df: df.ts.dt.weekday == 0),
    ("ts.dt.dayofyear > 180", lambda df: df.ts.dt.dayofyear > 180),
    ("ts.dt.quarter == 3", lambda df: df.ts.dt.quarter == 3),
]


def _ts_frame():
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(seconds=int(s))
          for s in rng.integers(0, 365 * 24 * 3600, 200)]
    ts[5] = pd.NaT
    return pd.DataFrame({"ts": pd.Series(ts), "v": np.arange(200)})


@pytest.mark.parametrize("expr,oracle", DT_FIELD_EXPRS)
def test_dt_fields_match_pandas(expr, oracle):
    df = _ts_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate(expr, table.schema)
    assert isinstance(pred, Predicate), expr  # compiled, not pandas fallback
    got = pred.filter(table).column("v").to_pylist()
    expected = df.loc[oracle(df).fillna(False).astype(bool), "v"].tolist()
    assert got == expected, expr


def test_timestamp_literal_comparison_compiled():
    df = _ts_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    for expr in ("ts >= '2024-06-01'",
                 "ts < '2024-03-15 12:30:00'",
                 "'2024-02-01' <= ts <= '2024-02-29'"):
        pred = compile_predicate(expr, table.schema)
        assert isinstance(pred, Predicate), expr
        got = pred.filter(table).column("v").to_pylist()
        expected = df.query(expr)["v"].tolist()
        assert got == expected, expr


def test_timestamp_literal_tz_aware_wall_time():
    ts = pd.Series(pd.date_range("2024-03-01", periods=48, freq="h",
                                 tz="America/New_York"))
    df = pd.DataFrame({"ts": ts, "v": np.arange(48)})
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("ts >= '2024-03-02'", table.schema)
    assert isinstance(pred, Predicate)
    got = pred.filter(table).column("v").to_pylist()
    # pandas-query semantics: naive literal = wall time in the column's tz
    expected = df[df.ts >= pd.Timestamp("2024-03-02", tz="America/New_York")][
        "v"].tolist()
    assert got == expected


def test_date32_literal_comparison():
    days = pd.date_range("2024-01-01", periods=20).date
    table = pa.table({"d": pa.array(days, pa.date32()),
                      "v": pa.array(np.arange(20))})
    pred = compile_predicate("d > '2024-01-10'", table.schema)
    assert isinstance(pred, Predicate)
    assert pred.filter(table).column("v").to_pylist() == list(range(10, 20))


def test_dt_field_through_runner_where():
    df = _ts_frame()
    a = hq.Mean("v", where="ts.dt.quarter == 1 and ts.notna()")
    ctx = do_analysis_run(df, [a], chunk_rows=64)
    expected = df.loc[df.ts.dt.quarter.eq(1).fillna(False), "v"].mean()
    np.testing.assert_allclose(ctx.metric_map[a].value.get(), expected)


def test_unknown_dt_field_falls_back():
    df = _ts_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("ts.dt.days_in_month == 31", table.schema)
    assert isinstance(pred, PandasPredicate)  # outside the compiled surface
    assert pred.filter(table).num_rows == len(
        df[df.ts.dt.days_in_month == 31])


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4 * 365 * 24 * 3600),
             min_size=1, max_size=50),
    st.integers(min_value=0, max_value=4 * 365 * 24 * 3600),
    st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
)
def test_timestamp_comparison_differential(offsets, pivot, op):
    base = pd.Timestamp("2022-01-01")
    df = pd.DataFrame({"ts": [base + pd.Timedelta(seconds=s) for s in offsets]})
    lit = (base + pd.Timedelta(seconds=pivot)).strftime("%Y-%m-%d %H:%M:%S")
    table = pa.Table.from_pandas(df, preserve_index=False)
    expr = f"ts {op} '{lit}'"
    pred = compile_predicate(expr, table.schema)
    assert isinstance(pred, Predicate)
    assert pred.filter(table).num_rows == len(df.query(expr))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4 * 365 * 24 * 3600),
             min_size=1, max_size=50),
    st.sampled_from(["year", "month", "day", "hour", "dayofweek",
                     "dayofyear", "quarter"]),
    st.integers(min_value=0, max_value=2026),
)
def test_dt_field_differential(offsets, field, pivot):
    base = pd.Timestamp("2022-01-01")
    df = pd.DataFrame({"ts": [base + pd.Timedelta(seconds=s) for s in offsets]})
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate(f"ts.dt.{field} >= {pivot}", table.schema)
    assert isinstance(pred, Predicate)
    expected = (getattr(df.ts.dt, field) >= pivot).sum()
    assert pred.filter(table).num_rows == expected


# -- string surface (.str accessors) -----------------------------------------

def _str_frame():
    rng = np.random.default_rng(7)
    words = ["Alpha", "beta", "GAMMA", "  pad  ", "123", "a1b2", "",
             "error: disk full", "warn low", "Tit Le", "über", "naïve",
             "tab\tsep", "multi word text here"]
    s = [words[i] for i in rng.integers(0, len(words), 300)]
    s[3] = None
    s[77] = None
    return pd.DataFrame({"s": pd.Series(s, dtype=object),
                         "v": np.arange(300)})


STR_EXPRS = [
    ("s.str.len() >= 5", lambda df: df.s.str.len() >= 5),
    ("s.str.lower() == 'alpha'", lambda df: df.s.str.lower() == "alpha"),
    ("s.str.upper() == 'GAMMA'", lambda df: df.s.str.upper() == "GAMMA"),
    ("s.str.strip() == 'pad'", lambda df: df.s.str.strip() == "pad"),
    ("s.str.lstrip() == 'pad  '", lambda df: df.s.str.lstrip() == "pad  "),
    ("s.str.rstrip() == '  pad'", lambda df: df.s.str.rstrip() == "  pad"),
    ("s.str.isdigit()", lambda df: df.s.str.isdigit()),
    ("s.str.isalpha()", lambda df: df.s.str.isalpha()),
    ("s.str.isalnum()", lambda df: df.s.str.isalnum()),
    ("s.str.isspace()", lambda df: df.s.str.isspace()),
    ("s.str.islower()", lambda df: df.s.str.islower()),
    ("s.str.isupper()", lambda df: df.s.str.isupper()),
    ("s.str.istitle()", lambda df: df.s.str.istitle()),
    ("s.str.contains('err')", lambda df: df.s.str.contains("err")),
    ("s.str.contains('a.b', regex=False)",
     lambda df: df.s.str.contains("a.b", regex=False)),
    ("s.str.contains('ERR', case=False)",
     lambda df: df.s.str.contains("ERR", case=False)),
    ("s.str.contains('^(err|warn)')",
     lambda df: df.s.str.contains("^(err|warn)")),
    ("s.str.startswith('a')", lambda df: df.s.str.startswith("a")),
    ("s.str.startswith(('a', 'b'))",
     lambda df: df.s.str.startswith(("a", "b"))),
    ("s.str.endswith('full')", lambda df: df.s.str.endswith("full")),
    ("s.str.match('[a-z]+\\d')", lambda df: df.s.str.match(r"[a-z]+\d")),
    ("s.str.fullmatch('\\d+')", lambda df: df.s.str.fullmatch(r"\d+")),
    ("s.str.count('a') >= 2", lambda df: df.s.str.count("a") >= 2),
]


@pytest.mark.parametrize("expr,oracle", STR_EXPRS)
def test_str_methods_match_pandas(expr, oracle):
    df = _str_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate(expr, table.schema)
    assert isinstance(pred, Predicate), expr  # compiled, not pandas fallback
    got = pred.filter(table).column("v").to_pylist()
    expected = df.loc[oracle(df).fillna(False).astype(bool), "v"].tolist()
    assert got == expected, expr


def test_str_lookahead_pattern_falls_back():
    # lookaheads are not RE2 — compile probe must route to pandas fallback,
    # which mirrors pandas exactly (incl. pandas' own query() raise on
    # NaN-containing str masks — hence the null-free frame here)
    df = _str_frame().dropna(subset=["s"]).reset_index(drop=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("s.str.contains('a(?=1)')", table.schema)
    assert isinstance(pred, PandasPredicate)
    got = pred.filter(table).num_rows
    assert got == int(df.s.str.contains("a(?=1)").sum())


def test_str_na_kwarg_falls_back():
    df = _str_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("s.str.contains('a', na=False)", table.schema)
    assert isinstance(pred, PandasPredicate)


def test_str_through_runner_where():
    df = _str_frame()
    a = hq.Mean("v", where="s.str.startswith('err') or s.str.isdigit()")
    ctx = do_analysis_run(df, [a], chunk_rows=64)
    mask = (df.s.str.startswith("err") | df.s.str.isdigit()).fillna(False)
    np.testing.assert_allclose(ctx.metric_map[a].value.get(),
                               df.loc[mask, "v"].mean())


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(alphabet="abcXYZ 19.", max_size=8), min_size=1,
             max_size=40),
    st.sampled_from(["contains", "startswith", "endswith", "match"]),
    st.text(alphabet="abcX1", min_size=1, max_size=3),
)
def test_str_pattern_differential(values, meth, pat):
    df = pd.DataFrame({"s": pd.Series(values, dtype=object)})
    table = pa.Table.from_pandas(df, preserve_index=False)
    expr = f"s.str.{meth}('{pat}')"
    pred = compile_predicate(expr, table.schema)
    assert isinstance(pred, Predicate), expr
    expected = int(getattr(df.s.str, meth)(pat).fillna(False).sum())
    assert pred.filter(table).num_rows == expected, expr


def test_tz_aware_literal_vs_naive_column_falls_back():
    # pa.scalar would silently shift a tz-aware literal to UTC wall time
    # against a naive column; pandas RAISES — so the compiled path must
    # refuse at compile time and route to the pandas fallback
    df = _ts_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("ts >= '2024-06-01T00:00:00+02:00'",
                             table.schema)
    assert isinstance(pred, PandasPredicate)
    with pytest.raises(TypeError):
        pred.filter(table)


def test_literal_coercion_hoisted_to_compile_time(monkeypatch):
    # the coercion (regex + pd.Timestamp parse) must run at compile time,
    # not once per batch inside the comparison leg
    import hooqu_ray.functions.expr as ex

    calls = {"n": 0}
    orig = ex._coerce_literal

    def counting(value, other_type):
        calls["n"] += 1
        return orig(value, other_type)

    monkeypatch.setattr(ex, "_coerce_literal", counting)
    df = _ts_frame()
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("ts >= '2024-06-01'", table.schema)
    compiled_calls = calls["n"]
    assert compiled_calls >= 1
    for _ in range(5):
        pred.filter(table)
    assert calls["n"] == compiled_calls  # no per-batch re-coercion


def test_column_in_column_falls_back_to_pandas():
    # 'a in b' with a COLUMN rhs is outside the compiled surface (the
    # value set must be a list literal) — must route to pandas, whose
    # query() gives isin semantics, not crash at filter time
    df = pd.DataFrame({"a": [1, 2, 3], "b": [3, 3, 3]})
    table = pa.Table.from_pandas(df, preserve_index=False)
    pred = compile_predicate("a in b", table.schema)
    assert isinstance(pred, PandasPredicate)
    assert pred.filter(table).column("a").to_pylist() == [3]


# ------------------------------------------------ where / coalesce (round 5)


def _wc_frame():
    return pd.DataFrame({
        "x": [1.0, 2.0, None, np.nan, 5.0, -3.0],
        "y": [10, 20, 30, 40, 50, 60],
        "s": ["a", None, "c", "d", None, "f"],
    })


def test_where_sql_case_semantics():
    # null/NaN condition takes the ELSE branch (SQL CASE), not null-propagate
    t = pa.Table.from_pandas(_wc_frame(), preserve_index=False)
    pred = compile_predicate("where(x > 1.5, y, -1)", t.schema)
    assert not isinstance(pred, PandasPredicate)
    assert pred.values(t).to_pylist() == [-1, 20, -1, -1, 50, -1]
    # scalar-only branches infer a type
    assert compile_predicate("where(y > 25, 1, -1)", t.schema).values(
        t).to_pylist() == [-1, -1, 1, 1, 1, 1]
    # ELSE NULL via a None literal
    got = compile_predicate("where(x > 1.5, x, None)", t.schema).values(t)
    assert got.to_pylist() == [None, 2.0, None, None, 5.0, None]


def test_coalesce_nan_is_null():
    t = pa.Table.from_pandas(_wc_frame(), preserve_index=False)
    pred = compile_predicate("coalesce(x, 0.0)", t.schema)
    assert not isinstance(pred, PandasPredicate)
    assert pred.values(t).to_pylist() == [1.0, 2.0, 0.0, 0.0, 5.0, -3.0]
    # column fallback then literal; strings too
    got = compile_predicate("coalesce(s, 'missing')", t.schema).values(t)
    assert got.to_pylist() == ["a", "missing", "c", "d", "missing", "f"]


def test_where_coalesce_compose_and_filter():
    t = pa.Table.from_pandas(_wc_frame(), preserve_index=False)
    pred = compile_predicate(
        "coalesce(where(x > 1.5, x, None), -1.0) > 0", t.schema)
    assert pred.filter(t).column("y").to_pylist() == [20, 50]


def test_where_coalesce_arity_errors():
    t = pa.Table.from_pandas(_wc_frame(), preserve_index=False)
    # wrong arity is NOT pandas syntax either -> compile_predicate routes to
    # the pandas fallback, which then fails at eval time; the compiled path
    # itself must raise ExprCompileError
    with pytest.raises(ExprCompileError):
        Predicate("where(x > 1.5, y)", t.schema)
    with pytest.raises(ExprCompileError):
        Predicate("coalesce(x)", t.schema)
    with pytest.raises(ExprCompileError):
        Predicate("greatest(x)", t.schema)
    with pytest.raises(ExprCompileError):
        Predicate("magic(x, y)", t.schema)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-50, max_value=50),
                  st.just(float("nan"))),
        min_size=1, max_size=30),
    pivot=st.floats(min_value=-10, max_value=10),
)
def test_where_coalesce_differential(vals, pivot):
    """Differential vs an explicit pandas model of the documented SQL
    semantics: CASE WHEN (null cond -> else) and COALESCE (NaN = null)."""
    df = pd.DataFrame({"x": pd.array(vals, dtype="float64"),
                       "y": np.arange(len(vals), dtype=np.int64)})
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = compile_predicate(
        f"where(x > {pivot}, y, -1)", t.schema).values(t).to_pylist()
    cond = (df.x > pivot).fillna(False).to_numpy()
    exp = np.where(cond, df.y.to_numpy(), -1).tolist()
    assert got == exp
    got2 = compile_predicate(
        f"coalesce(x, {pivot})", t.schema).values(t).to_pylist()
    exp2 = df.x.fillna(pivot).to_numpy().tolist()  # pandas fillna covers NaN
    assert got2 == pytest.approx(exp2)


def test_where_coalesce_int_float_promotion():
    """SQL type promotion: an int column mixed with a fractional literal
    yields DOUBLE — the round-5 review caught pa.scalar(0.5, int64) == 0
    silently truncating."""
    t = pa.table({"y": pa.array([1, None, 3], pa.int64())})
    got = compile_predicate("coalesce(y, 0.5)", t.schema).values(t)
    assert got.type == pa.float64()
    assert got.to_pylist() == [1.0, 0.5, 3.0]
    got2 = compile_predicate("where(y > 1, y, -0.5)", t.schema).values(t)
    assert got2.to_pylist() == [-0.5, -0.5, 3.0]
    # int-only branches still stay integral
    got3 = compile_predicate("where(y > 1, y, -1)", t.schema).values(t)
    assert got3.type == pa.int64() and got3.to_pylist() == [-1, -1, 3]


def test_coalesce_scalar_first_argument():
    """SQL COALESCE(NULL, x) = x; a non-null constant fills every row —
    and the result must stay array-shaped so filters work."""
    t = pa.table({"x": pa.array([0.5, 2.5, None], pa.float64()),
                  "y": pa.array([1, 2, 3], pa.int64())})
    assert compile_predicate("coalesce(None, x)", t.schema).values(
        t).to_pylist() == [0.5, 2.5, None]
    assert compile_predicate("coalesce(2.0, x)", t.schema).values(
        t).to_pylist() == [2.0, 2.0, 2.0]
    got = compile_predicate("coalesce(None, x) > 1.5", t.schema).filter(t)
    assert got.column("y").to_pylist() == [2]
    # all-null constants: NULL result for every row
    assert compile_predicate(
        "coalesce(None, None)", t.schema).values(t).null_count == 3


def test_greatest_least_sql_semantics():
    """DuckDB GREATEST/LEAST parity: NULL arguments are identities, result
    NULL only when every argument is null; NaN follows the engine's
    NaN=null convention (documented DuckDB divergence on NaN data)."""
    t = pa.table({"x": pa.array([1.0, None, 3.0, np.nan], pa.float64()),
                  "y": pa.array([2.0, None, None, 1.0], pa.float64())})
    assert compile_predicate("greatest(x, y)", t.schema).values(
        t).to_pylist() == [2.0, None, 3.0, 1.0]
    assert compile_predicate("least(x, y)", t.schema).values(
        t).to_pylist() == [1.0, None, 3.0, 1.0]
    # literal mixing + int/float promotion + filtering end to end
    t2 = pa.table({"n": pa.array([1, 5, None], pa.int64()),
                   "m": pa.array([4, 2, 7], pa.int64())})
    got = compile_predicate("greatest(n, m, 2.5)", t2.schema).values(t2)
    assert got.to_pylist() == [4.0, 5.0, 7.0]
    kept = compile_predicate("least(n, m) <= 2", t2.schema).filter(t2)
    # least(1,4)=1, least(5,2)=2 keep; least(NULL,7)=7 (identity) drops
    assert kept.column("m").to_pylist() == [4, 2]


@settings(max_examples=60, deadline=None)
@given(
    xs=st.lists(st.one_of(st.none(),
                          st.floats(min_value=-50, max_value=50)),
                min_size=1, max_size=25),
    lit=st.floats(min_value=-10, max_value=10),
)
def test_greatest_least_differential(xs, lit):
    """Differential vs DuckDB GREATEST/LEAST on NaN-free data."""
    import duckdb

    df = pd.DataFrame({"x": pd.array(xs, dtype="float64"),
                       "y": np.arange(len(xs), dtype=np.float64)})
    t = pa.Table.from_pandas(df, preserve_index=False)
    got_g = compile_predicate(
        f"greatest(x, y, {lit})", t.schema).values(t).to_pylist()
    got_l = compile_predicate(
        f"least(x, y, {lit})", t.schema).values(t).to_pylist()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        f"SELECT greatest(x, y, {lit}) AS g, least(x, y, {lit}) AS l "
        "FROM t").df()
    assert got_g == pytest.approx(exp.g.tolist())
    assert got_l == pytest.approx(exp.l.tolist())
