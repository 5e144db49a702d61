"""Bloom-filter incremental dedup (pipelines/bloom.py): no false
negatives, exactness at large m, tree-OR merge equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _split(n=2000, overlap=0.6, seed=9):
    rng = np.random.default_rng(seed)
    corpus_keys = rng.choice(100_000, size=n, replace=False)
    n_old = int(n * overlap)
    new_keys = np.concatenate(
        [rng.choice(corpus_keys, n_old), rng.choice(100_000, n - n_old) + 200_000]
    )
    corpus = pd.DataFrame({"k": corpus_keys.astype(np.int64)})
    new = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "k": new_keys.astype(np.int64)}
    )
    return corpus, new


class TestBloom:
    def test_no_false_negatives_and_exact_at_large_m(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.bloom import bloom_new_rows

        corpus, new = _split()
        got = bloom_new_rows(
            rd.from_pandas(new).repartition(4),
            rd.from_pandas(corpus).repartition(4),
            "k",
        ).to_pandas()
        truly_new = new[~new["k"].isin(corpus["k"])]
        # guarantee: kept ⊆ truly new (a corpus key is NEVER kept)
        assert set(got["id"]) <= set(truly_new["id"])
        # at 2^22 bits vs 2k keys, FPs are ~impossible: exact equality
        assert sorted(got["id"]) == sorted(truly_new["id"])

    def test_invert_keeps_candidate_duplicates(self, ray_session):
        import ray
        import ray.data as rd

        from hooqu_ray.pipelines.bloom import BloomNewFilter, build_bloom

        corpus, new = _split(n=500)
        bm = build_bloom(rd.from_pandas(corpus), "k")
        ref = ray.put(bm)
        dup = rd.from_pandas(new).map_batches(
            BloomNewFilter(ref, "k", invert=True), batch_format="pyarrow"
        ).to_pandas()
        exact_dup = new[new["k"].isin(corpus["k"])]
        # invert keeps every true duplicate (may add FPs; none at this m)
        assert set(exact_dup["id"]) <= set(dup["id"])

    def test_tree_merge_matches_single_block(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.bloom import build_bloom

        corpus, _ = _split(n=300)
        one = build_bloom(rd.from_pandas(corpus).repartition(1), "k")
        many = build_bloom(
            rd.from_pandas(corpus).repartition(16), "k", fanout=2
        )
        assert np.array_equal(one, many)

    def test_float_keys(self, ray_session):
        import ray.data as rd

        from hooqu_ray.pipelines.bloom import bloom_new_rows

        corpus = pd.DataFrame({"k": [1.5, 2.5, -0.0]})
        new = pd.DataFrame({"id": [0, 1, 2, 3], "k": [1.5, 0.0, 9.25, 2.5]})
        got = bloom_new_rows(
            rd.from_pandas(new), rd.from_pandas(corpus), "k"
        ).to_pandas()
        # 0.0 must hash like the corpus's -0.0 (normalized) → dropped
        assert sorted(got["id"]) == [2]

    def test_power_of_two_required(self, ray_session):
        import pytest
        import ray.data as rd

        from hooqu_ray.pipelines.bloom import build_bloom

        with pytest.raises(ValueError, match="power of two"):
            build_bloom(
                rd.from_pandas(pd.DataFrame({"k": [1]})), "k", m_bits=1000
            )
