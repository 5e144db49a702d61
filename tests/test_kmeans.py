"""Distributed spherical k-means (pipelines/similarity.kmeans):
objective monotonicity, determinism, assignment completeness, and
separation of well-separated synthetic clusters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _blobs(n_per=60, k=3, dim=8, seed=3):
    # ORTHOGONAL centers: spherical k-means separates by ANGLE, so the
    # blobs must be angularly well-separated (random Gaussian centers can
    # land nearly collinear and legitimately share a centroid)
    rng = np.random.default_rng(seed)
    centers = np.eye(dim)[:k] * 4
    rows = []
    for c in range(k):
        pts = centers[c] + rng.normal(0, 0.05, (n_per, dim))
        rows.append(pts)
    m = np.vstack(rows)
    ids = np.arange(len(m), dtype=np.int64)
    emb = [list(map(float, v)) for v in m]
    return pd.DataFrame({"vec_id": ids, "embedding": emb}), k


class TestKMeans:
    def test_monotone_objective_and_full_assignment(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.similarity import kmeans

        df, k = _blobs()
        ds = rd.from_pandas(df).repartition(4)
        cent, assign, hist = kmeans(ds, n_clusters=k, n_iters=4)
        assert cent.shape == (k, 8)
        # spherical Lloyd's objective is non-decreasing
        assert all(b >= a - 1e-9 for a, b in zip(hist, hist[1:]))
        out = assign.to_pandas()
        assert len(out) == len(df)
        assert set(out.columns) == {"vec_id", "centroid"}
        # orthogonal blobs + farthest-point seeding → exact recovery:
        # blob ↔ centroid is a bijection
        out = out.sort_values("vec_id", ignore_index=True)
        true = np.repeat(np.arange(k), 60)
        for c in range(k):
            assert out["centroid"][true == c].nunique() == 1
        assert out["centroid"].nunique() == k

    def test_deterministic(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.similarity import kmeans

        df, k = _blobs(seed=11)
        c1, _, h1 = kmeans(rd.from_pandas(df).repartition(3), k, n_iters=3)
        c2, _, h2 = kmeans(rd.from_pandas(df).repartition(5), k, n_iters=3)
        # same data, different block layout → identical centroids (init is
        # hash-of-id based and partial sums are order-insensitive to 1e-9)
        np.testing.assert_allclose(c1, c2, atol=1e-7)
        np.testing.assert_allclose(h1, h2, atol=1e-6)

    def test_empty_raises(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.similarity import kmeans

        empty = rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float64()))})
        )
        with pytest.raises(ValueError, match="empty"):
            kmeans(empty, 2)


class TestHashedDocVectors:
    def test_md5_matches_duckdb_and_fast_is_deterministic(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from hooqu_ray.pipelines.similarity import hashed_doc_vectors

        rng = np.random.RandomState(21)
        vocab = ["tok%d" % i for i in range(40)]
        df = pd.DataFrame({
            "doc_id": np.arange(120, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, rng.randint(1, 25)))
                     for _ in range(120)],
        })
        df.loc[3, "text"] = None  # no rows for null text
        ds = rd.from_pandas(df).repartition(5)
        got = hashed_doc_vectors(ds, k=8, hash_fn="md5").to_pandas() \
            .sort_values(["doc_id", "dim"], ignore_index=True)
        exp = duckdb.sql("""
            WITH t AS (SELECT doc_id, COALESCE(text, '') AS text FROM df),
            wu AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+'))
                   AS term FROM t),
            d AS (SELECT doc_id, CAST(concat('0x',
              substr(md5(term), 1, 8)) AS BIGINT) % 8 AS dim FROM wu)
            SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS value
            FROM d GROUP BY doc_id, dim ORDER BY doc_id, dim""").df()
        pd.testing.assert_frame_equal(got, exp)

        # fast path: per-doc total counts must equal md5 path totals, and
        # two runs must be identical (cross-run determinism)
        f1 = hashed_doc_vectors(ds, k=8, hash_fn="fast").to_pandas() \
            .sort_values(["doc_id", "dim"], ignore_index=True)
        f2 = hashed_doc_vectors(ds, k=8, hash_fn="fast").to_pandas() \
            .sort_values(["doc_id", "dim"], ignore_index=True)
        pd.testing.assert_frame_equal(f1, f2)
        tot_f = f1.groupby("doc_id")["value"].sum()
        tot_m = got.groupby("doc_id")["value"].sum()
        pd.testing.assert_series_equal(tot_f, tot_m)

    def test_validation(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd
        from hooqu_ray.pipelines.similarity import hashed_doc_vectors

        d = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            hashed_doc_vectors(d, k=0)
        with pytest.raises(ValueError):
            hashed_doc_vectors(d, k=4, hash_fn="nope")


class TestHashedDocVectorsRegressions:
    def test_string_ids_and_all_null_text(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from hooqu_ray.pipelines.similarity import hashed_doc_vectors

        df = pd.DataFrame({"doc_id": ["d-1", "d-2"],
                           "text": ["a b a", "c"]})
        got = hashed_doc_vectors(rd.from_pandas(df), k=4, hash_fn="md5") \
            .to_pandas().sort_values(["doc_id", "dim"], ignore_index=True)
        assert set(got["doc_id"]) == {"d-1", "d-2"}
        assert got.groupby("doc_id")["value"].sum().tolist() == [3, 1]

        nulls = pd.DataFrame({"doc_id": [1, 2], "text": [None, "   "]})
        out = hashed_doc_vectors(rd.from_pandas(nulls), k=4)
        assert out.count() == 0
        assert out.schema().names == ["doc_id", "dim", "value"]
