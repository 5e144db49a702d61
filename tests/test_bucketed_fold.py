"""bucketed_group_fold — the corpus-cardinality keyed exchange.

Ray's sort-based groupby pays a per-GROUP Python cost in its reduce tasks
(~5 µs/row at near-unique keys); the bucketed fold exchanges by
``hash64(key tuple) % B`` (a small int32) and folds each bucket with one
vectorized Arrow ``group_by``.  These tests pin exactness vs pandas, null
semantics in both modes, multi-key tuples, the finalize hook, hot-key
pre-combined inputs, and degenerate (empty / schema-less-block) datasets.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hooqu_ray.functions.shuffle import (
    _row_hash64,
    bucketed_group_fold,
    tree_group_sum,
)


def _as_dict(df, keys, val):
    out = {}
    for _, row in df.iterrows():
        k = tuple(None if (v is None or v != v) else v for v in row[keys])
        out[k if len(keys) > 1 else k[0]] = row[val]
    return out


def test_matches_pandas_groupby_random(ray_session):
    rng = np.random.default_rng(11)
    n = 50_000
    df = pd.DataFrame({
        "k": [f"id_{i:05d}" for i in rng.integers(0, 20_000, n)],
        "v": rng.integers(-5, 100, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(16)
    out = bucketed_group_fold(ds, ["k"], ["v"], ["sum"]).to_pandas()
    exp = df.groupby("k", as_index=False).v.sum()
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        exp.sort_values("k").reset_index(drop=True), check_like=True)


def test_multi_key_min_max_sum(ray_session):
    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "a": rng.integers(0, 50, n).astype(np.int64),
        "b": [f"g{i}" for i in rng.integers(0, 40, n)],
        "x": rng.normal(size=n),
        "y": rng.integers(0, 1000, n).astype(np.int64),
    })
    df2 = df.assign(x2=df.x)
    ds2 = rd.from_pandas(df2).repartition(8)
    out = bucketed_group_fold(
        ds2, ["a", "b"], ["x", "y", "x2"], ["sum", "min", "max"]).to_pandas()
    exp = df2.groupby(["a", "b"], as_index=False).agg(
        x=("x", "sum"), y=("y", "min"), x2=("x2", "max"))
    got = out.sort_values(["a", "b"]).reset_index(drop=True)
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_like=True, atol=1e-9)


def test_null_keys_both_modes(ray_session):
    df = pd.DataFrame({"k": ["a", None, "a", None, "b"],
                       "v": [1, 2, 3, 4, 5]})
    ds = rd.from_pandas(df).repartition(3)
    keep = bucketed_group_fold(ds, ["k"], ["v"], ["sum"],
                               drop_null_keys=False).to_pandas()
    got = _as_dict(keep, ["k"], "v")
    assert got == {"a": 4, None: 6, "b": 5}
    drop = bucketed_group_fold(ds, ["k"], ["v"], ["sum"],
                               drop_null_keys=True).to_pandas()
    assert _as_dict(drop, ["k"], "v") == {"a": 4, "b": 5}


def test_finalize_per_bucket_summary(ray_session):
    df = pd.DataFrame({"k": [f"u{i}" for i in range(1000)] * 2,
                       "v": np.ones(2000, np.int64)})
    ds = rd.from_pandas(df).repartition(4)

    def summarize(folded: pa.Table) -> pa.Table:
        if len(folded) == 0:
            return pa.table({"groups": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        return pa.table({"groups": [len(folded)],
                         "rows": [pc.sum(folded.column("v")).as_py()]})

    rows = bucketed_group_fold(ds, ["k"], ["v"], ["sum"],
                               finalize=summarize).take_all()
    assert sum(r["groups"] for r in rows) == 1000
    assert sum(r["rows"] for r in rows) == 2000
    # buckets partition the key space: no key counted twice
    assert len(rows) >= 1


def test_empty_and_schemaless_inputs(ray_session):
    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="object"),
                                         "v": pd.Series(dtype="int64")}))
    out = bucketed_group_fold(empty, ["k"], ["v"], ["sum"])
    assert out.count() == 0
    # dataset whose schema lacks the key columns entirely
    other = rd.from_pandas(pd.DataFrame({"z": [1, 2]}))
    out2 = bucketed_group_fold(other, ["k"], ["v"], ["sum"])
    assert out2.count() == 0


def test_row_hash_deterministic_and_block_invariant():
    t = pa.table({"k": ["a", "b", None, "a"], "j": [1, 2, 3, 1]})
    h1 = _row_hash64(t, ["k", "j"])
    h2 = _row_hash64(t.slice(0, 2), ["k", "j"])
    # same rows hash identically regardless of block slicing
    assert h1[0] == h2[0] and h1[1] == h2[1]
    # equal key tuples collide, distinct ones (overwhelmingly) don't
    assert h1[0] == h1[3]
    assert h1[0] != h1[1]


def test_explicit_bucket_counts_agree(ray_session):
    df = pd.DataFrame({"k": [f"x{i % 777}" for i in range(10_000)],
                       "v": np.arange(10_000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8).materialize()
    base = None
    for b in (1, 7, 64):
        out = bucketed_group_fold(ds, ["k"], ["v"], ["sum"],
                                  num_buckets=b).to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        if base is None:
            base = out
        else:
            pd.testing.assert_frame_equal(out, base)


def test_tree_fallback_rides_bucketed_exchange(ray_session):
    # force the fallback arm (max_fold_rows tiny) on corpus-like keys and
    # check exactness — this is the VERDICT #1 "fallback exercises the
    # bucketed exchange" pin
    rng = np.random.default_rng(9)
    n = 30_000
    df = pd.DataFrame({"k": [f"u{i}" for i in rng.integers(0, 25_000, n)],
                       "v": np.ones(n, np.int64)})
    ds = rd.from_pandas(df).repartition(16)
    out = tree_group_sum(ds, ["k"], ["v"], max_fold_rows=10,
                         fanin=2).to_pandas()
    exp = df.groupby("k", as_index=False).v.sum()
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        exp.sort_values("k").reset_index(drop=True), check_like=True)


def test_hypothesis_differential_vs_pandas(ray_session):
    """Hypothesis differential: random key/value tables (string + int keys,
    nulls, skew, tiny and multi-block inputs) folded by the bucketed
    exchange must equal pandas groupby(dropna=False) for every func mix."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 400),
        nkeys=st.integers(1, 50),
        seed=st.integers(0, 10_000),
        funcs=st.lists(st.sampled_from(["sum", "min", "max"]),
                       min_size=1, max_size=2),
        blocks=st.integers(1, 6),
    )
    def prop(n, nkeys, seed, funcs, blocks):
        rng = np.random.default_rng(seed)
        keys = np.array([f"k{i}" for i in rng.integers(0, nkeys, n)],
                        dtype=object)
        keys[rng.random(n) < 0.1] = None  # null keys are their own group
        df = pd.DataFrame({"k": keys})
        cols = [f"v{j}" for j in range(len(funcs))]
        for c in cols:
            df[c] = rng.integers(-100, 100, n)
        ds = rd.from_pandas(df).repartition(blocks)
        got = (bucketed_group_fold(ds, ["k"], cols, funcs=funcs)
               .to_pandas().sort_values("k", ignore_index=True,
                                        na_position="last"))
        exp = (df.groupby("k", dropna=False, as_index=False)
               .agg({c: f for c, f in zip(cols, funcs)})
               .sort_values("k", ignore_index=True, na_position="last"))
        pd.testing.assert_frame_equal(got, exp, check_like=True,
                                      check_dtype=False)

    prop()
