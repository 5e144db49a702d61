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
