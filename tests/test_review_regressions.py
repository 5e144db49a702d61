"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import hooqu_ray as hq


def test_failed_state_poisons_from_either_side():
    from hooqu_ray.states import FailedState, NumMatchesAndCount, merge_states

    ok = NumMatchesAndCount(3, 5)
    bad = FailedState("ValueError", "boom")
    assert merge_states(ok, bad) is bad
    assert merge_states(bad, ok) is bad
    assert merge_states(None, bad) is bad


def test_failed_block_yields_failure_metric_not_crash():
    # a predicate that compiles but explodes at runtime on some blocks
    df = pd.DataFrame({"a": [1, 2, 3, 4], "s": ["x", "y", "z", "w"]})
    a = hq.Compliance("bad", "s > 1")  # string vs int comparison fails in Arrow
    from hooqu_ray.runner import do_analysis_run

    ctx = do_analysis_run(df, [a], chunk_rows=2)
    assert ctx.metric_map[a].value.isFailure  # contained, not raised


def test_config_hash_sees_predicates_and_where():
    from hooqu_ray.state.checkpoint import _config_hash

    h1 = _config_hash([hq.Compliance("rule", "x > 0"), hq.Minimum("m", "y > 0")])
    h2 = _config_hash([hq.Compliance("rule", "x > 5"), hq.Minimum("m", "y > 0")])
    h3 = _config_hash([hq.Compliance("rule", "x > 0"), hq.Minimum("m", None)])
    assert h1 != h2
    assert h1 != h3


def test_ngram_jaccard_short_texts_not_equal():
    from hooqu_ray.pipelines.dedup import ngram_jaccard

    assert ngram_jaccard("hello world", "goodbye moon", 3) == 0.0
    assert ngram_jaccard("hello world", "hello world", 3) == 1.0
    assert ngram_jaccard("", "", 3) == 1.0
    assert ngram_jaccard("one two", "", 3) == 0.0


def test_exact_dedup_string_ids(ray_session):
    import ray.data as rd
    from hooqu_ray.pipelines.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": ["uuid-b", "uuid-a", "uuid-c"], "text": ["same", "same", "other"]}
    )
    kept = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert sorted(kept["doc_id"]) == ["uuid-a", "uuid-c"]


def test_knn_self_in_single_block_keeps_k_results(ray_session):
    import ray.data as rd
    from hooqu_ray.pipelines.similarity import knn_brute_force

    rng = np.random.default_rng(17)
    mat = rng.standard_normal((6, 8))
    df = pd.DataFrame({"vec_id": range(6), "embedding": list(mat.astype(np.float32))})
    # ONE block containing the query itself
    res = knn_brute_force(rd.from_pandas(df), mat[:1], k=3, query_ids=[0]).to_pandas()
    assert len(res) == 3
    assert 0 not in set(res["vec_id"])
    # and the 3 results are the true top-3 excluding self
    q = mat[0] / np.linalg.norm(mat[0])
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ q
    sims[0] = -np.inf
    assert set(res["vec_id"]) == set(np.argsort(-sims)[:3])


def test_knn_ivf_with_empty_probe_blocks(ray_session):
    import ray.data as rd
    from hooqu_ray.pipelines.similarity import knn_ivf

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((40, 8))
    df = pd.DataFrame({"vec_id": range(40), "embedding": list(mat.astype(np.float32))})
    # many partitions → centroid filter empties several blocks
    res = knn_ivf(rd.from_pandas(df).repartition(10), mat[:2], k=5,
                  n_centroids=8, nprobe=2).to_pandas()
    assert (res.groupby("query_idx").size() <= 5).all()


def test_nbsp_mean_word_len_matches_oracle():
    import sys

    sys.path.insert(0, "tests")
    from hooqu_ray.stages.heuristics import compute_features

    text = "word1 word2" + "\u00a0" + "three four five"
    t = pa.table({"text": [text]})
    out = compute_features(t)
    words = text.split()
    expected = sum(len(w) for w in words) / len(words)
    assert out.column("mean_word_len")[0].as_py() == expected
    assert out.column("n_words")[0].as_py() == len(words)


def test_stale_partition_states_excluded_from_merge(ray_session, tmp_path):
    from hooqu_ray.state.checkpoint import CheckpointedRun

    frag = str(tmp_path / "f.parquet")
    pd.DataFrame({"x": range(10)}).to_parquet(frag)
    out = str(tmp_path / "out")
    # run with config A over one fragment list, then change analyzers and run
    # with the fragment at a DIFFERENT index so the stale partition remains
    CheckpointedRun(out, [hq.Sum("x")]).run([frag])
    run_b = CheckpointedRun(out, [hq.Mean("x")])
    run_b.run([frag, frag])  # part 0 recomputed (hash differs), part 1 fresh
    ctx = run_b.merged_metrics()
    vals = [m.value.get() for m in ctx.all_metrics()]
    assert vals == [4.5]  # mean over both committed partitions, no Sum state mixed in


# --- round-2 review findings ---------------------------------------------


def test_ascii_lower_parity_on_special_casing():
    import sys

    sys.path.insert(0, "tests")
    from hooqu_ray.stages.models import CharBigramLM, TrigramLangID
    from reference_impl import OracleModels

    texts = ["İstanbul STRASSE ﬁne ÄÖÜ mixed CASE text", "ǅungla Ǆ title-case"]
    lm, lid, om = CharBigramLM(), TrigramLangID(), OracleModels()
    ppl = lm.perplexity(texts)
    langs, _ = lid.predict(texts)
    for i, t in enumerate(texts):
        assert abs(ppl[i] - om.ppl(t)) < 1e-12, t
        assert langs[i] == om.lang(t), t


def test_simhash_larger_hamming_uses_enough_bands(ray_session):
    import ray.data as rd
    from hooqu_ray.pipelines.dedup import SimHasher, simhash_near_pairs

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank today while the sun shines on the calm green water")
    near = base.replace("today", "tomorrow").replace("calm", "wild")
    df = pd.DataFrame({"doc_id": [1, 2], "text": [base, near]})
    sh = SimHasher()
    d = bin(sh.simhash(base) ^ sh.simhash(near)).count("1")
    if d == 0 or d > 12:
        pytest.skip(f"texts ended up at hamming {d}; test needs 1..12")
    pairs = simhash_near_pairs(rd.from_pandas(df), max_hamming=d).to_pandas()
    assert (1, 2) in set(zip(pairs.id_a, pairs.id_b))
    assert pairs.set_index(["id_a", "id_b"]).loc[(1, 2), "hamming"] == d

    with pytest.raises(ValueError):
        simhash_near_pairs(rd.from_pandas(df), max_hamming=20)


def test_verify_pairs_skips_unresolvable_texts(ray_session):
    import ray.data as rd
    from hooqu_ray.pipelines.dedup import verify_pairs

    corpus = pd.DataFrame({"doc_id": [1], "text": ["only this document exists"]})
    stale_pairs = rd.from_pandas(pd.DataFrame(
        {"id_a": [98], "id_b": [99], "est_jaccard": [1.0]}
    ))
    out = verify_pairs(rd.from_pandas(corpus), stale_pairs).to_pandas()
    assert len(out) == 0  # never "confirms" pairs whose texts can't be fetched


def test_merged_metrics_scoped_to_current_fragments(ray_session, tmp_path):
    from hooqu_ray.state.checkpoint import CheckpointedRun

    f1, f2, f3 = [str(tmp_path / f"f{i}.parquet") for i in range(3)]
    for i, p in enumerate((f1, f2, f3)):
        pd.DataFrame({"x": range(i * 10, i * 10 + 10)}).to_parquet(p)
    out = str(tmp_path / "out")
    CheckpointedRun(out, [hq.Size()]).run([f1, f2, f3])
    shorter = CheckpointedRun(out, [hq.Size()])
    shorter.run([f1, f2])  # f3's partition remains on disk but is out of scope
    assert shorter.merged_metrics().all_metrics()[0].value.get() == 20.0
