"""Unit tests for the single-scan column profiler: dirty-data folding
(nulls, all-null columns), type routing, and column selection."""

import numpy as np
import pyarrow as pa
import pytest


def _table():
    return pa.table(
        {
            "num": pa.array([1.0, 2.0, None, 4.0], pa.float64()),
            "txt": pa.array(["a", "bbb", None, "cc"], pa.string()),
            "all_null": pa.array([None] * 4, pa.float64()),
            # non-scalar type: excluded from auto-selection
            "ignored_list": pa.array([[1], [2], [3], [4]],
                                     pa.list_(pa.int64())),
        }
    )


def test_profile_values_and_null_folding(ray_session):
    import ray.data as rd

    from hooqu_ray.profiler import profile

    out = profile(rd.from_arrow(_table())).to_pandas().set_index("column")
    # auto-selection: numeric + string columns only
    assert sorted(out.index) == ["all_null", "num", "txt"]

    num = out.loc["num"]
    assert num.completeness == 0.75
    assert num["min"] == 1.0 and num["max"] == 4.0
    assert abs(num["mean"] - 7.0 / 3) < 1e-12
    assert np.isnan(num["min_len"]) and np.isnan(num["max_len"])
    assert num["approx_distinct"] == 3  # exact at this tiny cardinality

    txt = out.loc["txt"]
    assert txt.completeness == 0.75
    assert txt["min_len"] == 1 and txt["max_len"] == 3
    assert np.isnan(txt["min"]) and np.isnan(txt["std"])

    # an all-null column must profile, not crash: stats fold to null
    nul = out.loc["all_null"]
    assert nul.completeness == 0.0
    assert np.isnan(nul["min"]) and np.isnan(nul["mean"])


def test_profile_column_subset_and_errors(ray_session):
    import ray.data as rd

    from hooqu_ray.profiler import profile

    ds = rd.from_arrow(_table())
    out = profile(ds, ["num"]).to_pandas()
    assert out["column"].tolist() == ["num"]
    with pytest.raises(KeyError, match="not in dataset"):
        profile(ds, ["nope"])
