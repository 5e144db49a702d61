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


class TestGroupedProfile:
    def test_matches_duckdb_report(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd
        from hooqu_ray.profiler import grouped_profile

        rng = np.random.RandomState(6)
        n = 3000
        df = pd.DataFrame({
            "src": rng.choice(["a", "b", "c"], n),
            "lang": rng.choice(["en", "de", None, "fr"], n),
            "score": np.where(rng.rand(n) < 0.1, np.nan,
                              rng.randint(0, 50, n).astype(float)),
        })
        df.loc[4, "src"] = None  # null group drops
        got = grouped_profile(rd.from_pandas(df).repartition(6), "src",
                              ["lang", "score"]).to_pandas() \
            .sort_values(["src", "col_name"], ignore_index=True)
        exp = duckdb.sql("""
            SELECT src, col_name, n_rows, n_null, n_distinct FROM (
              SELECT src, 'lang' AS col_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct
              FROM df WHERE src IS NOT NULL GROUP BY src
              UNION ALL
              SELECT src, 'score', CAST(count(*) AS BIGINT),
                CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST(count(DISTINCT score) AS BIGINT)
              FROM df WHERE src IS NOT NULL GROUP BY src
            ) ORDER BY src, col_name""").df()
        pd.testing.assert_frame_equal(got, exp)

    def test_all_null_column_and_empty(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import pytest
        import ray.data as rd
        from hooqu_ray.profiler import grouped_profile

        df = pd.DataFrame({"g": ["x", "x"], "v": [None, None]})
        got = grouped_profile(rd.from_pandas(df), "g", ["v"]).to_pandas()
        assert got.iloc[0][["n_rows", "n_null", "n_distinct"]].tolist() \
            == [2, 2, 0]
        e = rd.from_arrow(pa.table({"g": pa.array([], pa.string()),
                                    "v": pa.array([], pa.float64())}))
        out = grouped_profile(e, "g", ["v"])
        assert out.count() == 0
        assert out.schema().names == ["g", "col_name", "n_rows", "n_null",
                                      "n_distinct"]
        with pytest.raises(ValueError):
            grouped_profile(e, "g", [])
