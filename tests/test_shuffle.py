"""Skew-aware shuffle helper + conversation sequence feature tests."""

import numpy as np
import pandas as pd
import pytest


def test_salted_group_aggregate_matches_plain(ray_session):
    import ray.data as rd

    from hooqu_ray.functions.shuffle import salted_group_aggregate

    rng = np.random.default_rng(11)
    n = 20_000
    # skewed: one hot key owns half the rows
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 200, n))
    df = pd.DataFrame({"user_id": keys, "value": rng.random(n).round(3)})
    res = (
        salted_group_aggregate(rd.from_pandas(df).repartition(8), "user_id", ["value"], buckets=8)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    expected = df.groupby("user_id", as_index=False)["value"].sum().sort_values(
        "user_id", ignore_index=True
    )
    assert res["user_id"].tolist() == expected["user_id"].tolist()
    np.testing.assert_allclose(res["sum(value)"], expected["value"], rtol=1e-9)


def test_grouped_sequence_apply_ordering(ray_session):
    import ray.data as rd

    from hooqu_ray.functions.shuffle import grouped_sequence_apply

    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "i": [3, 1, 0, 2, 1, 0, 2],
            "v": [30, 10, 0, 20, 100, 0, 200],
        }
    )

    def fn(group):
        return pd.DataFrame({"k": [group["k"].iloc[0]], "seq": ["-".join(map(str, group["v"]))]})

    out = (
        grouped_sequence_apply(rd.from_pandas(df).repartition(3), "k", fn, order_by="i")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert out.loc[0, "seq"] == "0-10-20-30"
    assert out.loc[1, "seq"] == "0-100-200"


def test_grouped_sequence_apply_oversize_guard(ray_session):
    import ray.data as rd

    from hooqu_ray.functions.shuffle import grouped_sequence_apply

    df = pd.DataFrame({"k": ["big"] * 50 + ["ok"] * 3, "i": range(53), "v": range(53)})

    def fn(group):
        return pd.DataFrame({"k": [group["k"].iloc[0]], "n": [len(group)]})

    out = grouped_sequence_apply(
        rd.from_pandas(df), "k", fn, order_by="i", max_group_rows=10
    ).to_pandas()
    assert "__oversized_group" in out.columns
    flagged = out[out["__oversized_group"] == True]  # noqa: E712
    assert flagged["__group_rows"].iloc[0] == 50
    assert (out[out["__oversized_group"] != True]["n"] == 3).any()  # noqa: E712


def test_conversation_features(ray_session):
    import ray.data as rd

    from hooqu_ray.pipelines import transcripts as tp
    from hooqu_ray.pipelines.synth import generate_transcripts

    table = generate_transcripts(n_convs=30, seed=21)
    feats = tp.conversation_features(rd.from_arrow(table).repartition(4)).to_pandas()
    pdf = table.to_pandas()
    assert len(feats) == pdf["conv_id"].nunique()
    sizes = pdf.groupby("conv_id").size()
    merged = feats.set_index("conv_id")
    assert (merged["n_turns"] == sizes.loc[merged.index]).all()
    # ts monotone by construction in the generator
    assert merged["ts_monotone"].all()


def test_conversation_features_sorted_matches_grouped(ray_session):
    """The sort-based pass (vectorized blocks + boundary merge) must agree
    with the per-key grouped apply on adversarial input: conversations that
    straddle block boundaries, broken role alternation, ts regressions at
    and away from seams, and core-role-free (tool/system-only) spans."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hooqu_ray.pipelines import transcripts as tp

    rng = np.random.default_rng(5)
    rows = []
    base = np.datetime64("2025-03-01T00:00:00", "us")
    for c in range(40):
        n = int(rng.integers(1, 30))
        roles = rng.choice(["user", "assistant", "system", "tool"], size=n,
                           p=[0.4, 0.4, 0.1, 0.1])
        ts = base + np.cumsum(rng.integers(-5, 60, size=n)).astype("timedelta64[s]")
        for i in range(n):
            rows.append((f"c{c:03d}", i, str(roles[i]), ts[i]))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    for nparts in (1, 7):
        ds = rd.from_pandas(pdf.sample(frac=1.0, random_state=3)).repartition(nparts)
        a = (
            tp.conversation_features(ds)
            .to_pandas()
            .sort_values("conv_id", ignore_index=True)
        )
        b = (
            tp.conversation_features_grouped(ds)
            .to_pandas()
            .sort_values("conv_id", ignore_index=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
