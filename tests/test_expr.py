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
