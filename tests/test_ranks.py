"""grouped_rank / grouped_exact_quantile: differentials vs pandas window
functions and per-group quantile(interpolation='nearest')."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from hooqu_ray.pipelines.ranks import grouped_exact_quantile, grouped_rank


def _frame(n=5_000, keys=40, vals=25, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64),
        "v": rng.integers(0, vals, n).astype(np.int64),  # heavy ties
        "id": np.arange(n, dtype=np.int64),
    })


def _got(ds_out):
    df = ds_out.to_pandas()
    return df.sort_values(["k", "v", "id"], ignore_index=True)


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("nblocks", [1, 13])
def test_rank_matches_pandas(ray_session, dense, nblocks):
    df = _frame()
    ds = rd.from_pandas(df).repartition(nblocks).materialize()
    out = _got(grouped_rank(ds, "k", "v", "id", dense=dense))
    method = "dense" if dense else "min"
    exp = df.assign(rank=df.groupby("k")["v"].rank(method=method)
                    .astype(np.int64)).sort_values(
        ["k", "v", "id"], ignore_index=True)
    pd.testing.assert_frame_equal(out, exp[["k", "v", "id", "rank"]])


def test_rank_null_key_and_order_dropped(ray_session):
    df = pd.DataFrame({"k": [1.0, None, 1.0, 2.0],
                       "v": [3.0, 1.0, None, 5.0],
                       "id": [0, 1, 2, 3]})
    ds = rd.from_pandas(df)
    out = grouped_rank(ds, "k", "v", "id").to_pandas()
    assert sorted(out.id.tolist()) == [0, 3]  # null key / null order drop
    assert out["rank"].tolist() == [1, 1]


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_grouped_quantile_matches_pandas_nearest(ray_session, q):
    # oracle = per-group SERIES quantile: pandas' GroupBy.quantile
    # ('nearest') rounds a .5 virtual index DOWN in its cython path while
    # Series.quantile (numpy round, half-to-even) rounds it to even — the
    # engine follows the Series/np.round rule (analyzers.quantile
    # .nearest_index, same as the SQL oracle)
    df = _frame(seed=3)
    ds = rd.from_pandas(df).repartition(11).materialize()
    out = grouped_exact_quantile(ds, "k", "v", q).to_pandas()
    out = out.sort_values("k", ignore_index=True)
    exp = (df.groupby("k")["v"]
           .apply(lambda s: s.quantile(q, interpolation="nearest"))
           .rename("q_value").reset_index())
    exp["q_value"] = exp["q_value"].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp.sort_values(
        "k", ignore_index=True)[["k", "q_value"]])


def test_grouped_quantile_ignores_nulls(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [1.0, None, 3.0, None, None]})
    ds = rd.from_pandas(df)
    out = grouped_exact_quantile(ds, "k", "v", 0.5).to_pandas()
    # group b has no valid values -> absent (SQL aggregate-null semantics)
    assert out.k.tolist() == ["a"]
    assert out.q_value.tolist() == [1.0]  # nearest of [1, 3] at q=.5 -> idx round(.5)=0


def test_grouped_quantile_invalid_q(ray_session):
    df = pd.DataFrame({"k": [1], "v": [1]})
    with pytest.raises(ValueError, match="q must be"):
        grouped_exact_quantile(rd.from_pandas(df), "k", "v", 1.5)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(-10, 10)),
             min_size=1, max_size=200),
    st.sampled_from([0.1, 0.5, 0.75]),
)
def test_grouped_quantile_differential(rows, q):
    df = pd.DataFrame(rows, columns=["k", "v"]).astype(np.int64)
    ds = rd.from_pandas(df).repartition(4)
    out = grouped_exact_quantile(ds, "k", "v", q).to_pandas()
    got = dict(zip(out.k, out.q_value))
    exp = df.groupby("k")["v"].apply(
        lambda s: s.quantile(q, interpolation="nearest")).to_dict()
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 6)),
             min_size=1, max_size=150),
    st.booleans(),
)
def test_rank_differential(rows, dense):
    df = pd.DataFrame(rows, columns=["k", "v"]).astype(np.int64)
    df["id"] = np.arange(len(df), dtype=np.int64)
    ds = rd.from_pandas(df).repartition(3)
    out = grouped_rank(ds, "k", "v", "id", dense=dense).to_pandas()
    got = dict(zip(out.id, out["rank"]))
    method = "dense" if dense else "min"
    exp = df.set_index("id").groupby("k")["v"].rank(method=method).astype(int).to_dict()
    assert got == exp


# -- NTILE -------------------------------------------------------------------

from hooqu_ray.pipelines.ranks import grouped_ntile


@pytest.mark.parametrize("n", [1, 3, 4, 7])
def test_ntile_matches_pandas(ray_session, n):
    df = _frame(n=3_000, keys=25, seed=5)
    ds = rd.from_pandas(df).repartition(9).materialize()
    out = grouped_ntile(ds, "k", "v", "id", n).to_pandas()
    got = dict(zip(out.id, out.tile))

    def sql_ntile(g):
        c = len(g)
        base, rem = divmod(c, n)
        sizes = [base + 1] * rem + [base] * (n - rem)
        tiles = np.repeat(np.arange(1, n + 1), sizes)[:c]
        g = g.sort_values(["v", "id"], kind="mergesort")
        return pd.Series(tiles, index=g.id)

    exp = {}
    for _, g in df.groupby("k"):
        exp.update(sql_ntile(g).to_dict())
    assert got == exp


def test_ntile_invalid_n(ray_session):
    df = pd.DataFrame({"k": [1], "v": [1], "id": [1]})
    with pytest.raises(ValueError, match="ntile n"):
        grouped_ntile(rd.from_pandas(df), "k", "v", "id", 0)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5)),
             min_size=1, max_size=120),
    st.integers(1, 5),
)
def test_ntile_differential(rows, n):
    df = pd.DataFrame(rows, columns=["k", "v"]).astype(np.int64)
    df["id"] = np.arange(len(df), dtype=np.int64)
    ds = rd.from_pandas(df).repartition(3)
    out = grouped_ntile(ds, "k", "v", "id", n).to_pandas()
    got = dict(zip(out.id, out.tile))
    exp = {}
    for _, g in df.groupby("k"):
        c = len(g)
        base, rem = divmod(c, n)
        sizes = [base + 1] * rem + [base] * (n - rem)
        tiles = np.repeat(np.arange(1, n + 1), sizes)[:c]
        g = g.sort_values(["v", "id"], kind="mergesort")
        exp.update(dict(zip(g.id, tiles)))
    assert got == exp


# -- PERCENT_RANK / CUME_DIST -------------------------------------------------

from hooqu_ray.pipelines.ranks import grouped_percent_rank


@pytest.mark.parametrize("cume", [False, True])
def test_percent_rank_matches_pandas(ray_session, cume):
    df = _frame(n=3_000, keys=25, seed=8)
    ds = rd.from_pandas(df).repartition(7).materialize()
    out = grouped_percent_rank(ds, "k", "v", "id", cume=cume).to_pandas()
    got = dict(zip(out.id, out.pct))
    if cume:
        ser = df.groupby("k")["v"].transform(
            lambda s: s.rank(method="max") / len(s))
    else:
        g = df.groupby("k")["v"]
        ser = (g.rank(method="min") - 1) / (g.transform("size") - 1).clip(lower=1)
        ser = ser.where(df.groupby("k")["v"].transform("size") > 1, 0.0)
    exp = dict(zip(df.id, ser.round(6)))
    assert got == exp


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5)),
             min_size=1, max_size=120),
    st.booleans(),
)
def test_percent_rank_differential(rows, cume):
    df = pd.DataFrame(rows, columns=["k", "v"]).astype(np.int64)
    df["id"] = np.arange(len(df), dtype=np.int64)
    ds = rd.from_pandas(df).repartition(3)
    out = grouped_percent_rank(ds, "k", "v", "id", cume=cume).to_pandas()
    got = dict(zip(out.id, out.pct))
    if cume:
        ser = df.groupby("k")["v"].transform(
            lambda s: s.rank(method="max") / len(s))
    else:
        g = df.groupby("k")["v"]
        sizes = g.transform("size")
        ser = ((g.rank(method="min") - 1) / (sizes - 1).clip(lower=1)
               ).where(sizes > 1, 0.0)
    exp = dict(zip(df.id, ser.round(6)))
    assert got == exp


# -- string_agg ---------------------------------------------------------------

from hooqu_ray.pipelines.ranks import grouped_string_agg


def test_string_agg_matches_pandas(ray_session):
    df = _frame(n=2_000, keys=20, seed=12)
    df["s"] = df.v.astype(str)
    ds = rd.from_pandas(df).repartition(6).materialize()
    out = grouped_string_agg(ds, "k", "s", "v", "id", sep="|").to_pandas()
    got = dict(zip(out.k, out["agg"]))
    exp = (df.sort_values(["k", "v", "id"])
           .groupby("k")["s"].agg(lambda s: "|".join(s)).to_dict())
    assert got == exp


def test_string_agg_skips_null_values(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [None, "x", None],
                       "o": [0, 1, 0], "id": [0, 1, 2]})
    out = grouped_string_agg(rd.from_pandas(df), "k", "v", "o", "id")
    rows = sorted(out.to_pandas().itertuples(index=False))
    # all-null group b is absent (documented; SQL would emit NULL)
    assert [(r.k, r.agg) for r in rows] == [("a", "x")]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)),
                min_size=1, max_size=100))
def test_string_agg_differential(rows):
    df = pd.DataFrame(rows, columns=["k", "o"]).astype(np.int64)
    df["id"] = np.arange(len(df), dtype=np.int64)
    df["v"] = df["o"].astype(str)
    ds = rd.from_pandas(df).repartition(3)
    out = grouped_string_agg(ds, "k", "v", "o", "id").to_pandas()
    got = dict(zip(out.k, out["agg"]))
    exp = (df.sort_values(["k", "o", "id"])
           .groupby("k")["v"].agg(lambda s: ",".join(s)).to_dict())
    assert got == exp
