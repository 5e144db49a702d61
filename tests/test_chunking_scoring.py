"""Chunking + domain-LLR-scoring tests with pure-Python oracles."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _py_chunks(text, size, overlap):
    toks = (text or "").split()
    step = size - overlap
    out, s = [], 0
    while s < len(toks):
        out.append(" ".join(toks[s : s + size]))
        s += step
    return out


class TestChunkStage:
    def test_matches_python_oracle(self):
        from hooqu_ray.pipelines.chunking import chunk_stage

        texts = [
            "a b c d e f g h i j",
            "x y z",
            None,
            "  p   q  ",
            "",
            "one",
        ]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = chunk_stage(t, size=4, overlap=1).to_pandas()
        exp_rows = []
        for d, txt in zip(range(len(texts)), texts):
            for i, c in enumerate(_py_chunks(txt, 4, 1)):
                exp_rows.append((d, i, c, len(c.split())))
        exp = pd.DataFrame(
            exp_rows, columns=["doc_id", "chunk_idx", "chunk_text", "n_tokens"]
        )
        pd.testing.assert_frame_equal(
            got.sort_values(["doc_id", "chunk_idx"], ignore_index=True), exp
        )

    def test_overlap_validation(self):
        from hooqu_ray.pipelines.chunking import chunk_stage

        t = pa.table({"doc_id": [1], "text": ["a b"]})
        with pytest.raises(ValueError):
            chunk_stage(t, size=4, overlap=4)

    def test_every_token_covered(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.chunking import chunk_documents

        ds = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(4)
        ch = chunk_documents(ds, size=16, overlap=4).to_pandas()
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        # invariant: chunk k covers tokens [k*step, k*step + n_tokens) and the
        # union of all chunks covers [0, L) with no gaps
        step = 16 - 4
        docs_l = docs.set_index("doc_id")["text"].map(
            lambda t: len((t or "").split())
        )
        ch["start"] = ch["chunk_idx"] * step
        ch["end"] = ch["start"] + ch["n_tokens"]
        for doc_id, grp in ch.groupby("doc_id"):
            g = grp.sort_values("chunk_idx")
            L = docs_l.loc[doc_id]
            assert g["start"].iloc[0] == 0
            assert g["end"].max() == L
            # no gaps: each chunk starts at or before the previous end
            assert (g["start"].iloc[1:].values <= g["end"].iloc[:-1].values).all()
        # every doc with >= 1 token produced chunks
        assert set(ch["doc_id"]) == set(docs_l[docs_l > 0].index)


class TestDomainLLR:
    def test_matches_python_oracle(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.scoring import domain_llr_score

        raw = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "spark ray data engine",
                    "ray ray dataset pipeline",
                    "cooking pasta recipe tonight",
                    None,
                ],
            }
        )
        target = raw[raw["doc_id"] <= 2]
        got = (
            domain_llr_score(
                rd.from_pandas(raw).repartition(2),
                rd.from_pandas(target),
                vocab_size=3,
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # python oracle
        from collections import Counter

        tgt_toks = [w for t in target["text"] for w in (t or "").split()]
        raw_toks = [w for t in raw["text"] for w in (t or "").split()]
        ct = Counter(tgt_toks)
        vocab = sorted(ct.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        v = len(vocab)
        cr = Counter(raw_toks)
        lr = {
            tok: math.log((c + 1) / (len(tgt_toks) + v))
            - math.log((cr[tok] + 1) / (len(raw_toks) + v))
            for tok, c in vocab
        }
        for _, row in got.iterrows():
            toks = (raw.set_index("doc_id").loc[row.doc_id, "text"] or "").split()
            iv = [lr[t] for t in toks if t in lr]
            assert row.n_tokens == len(toks)
            assert row.n_invocab == len(iv)
            exp = sum(iv) / len(iv) if iv else 0.0
            np.testing.assert_allclose(row.llr_score, exp, rtol=1e-12)
        # target-domain doc scores above the off-domain doc
        s = got.set_index("doc_id")["llr_score"]
        assert s[2] > s[3]

    def test_empty_target(self, ray_session):
        import ray.data as rd
        from hooqu_ray.pipelines.scoring import domain_llr_score

        raw = pd.DataFrame({"doc_id": [1], "text": ["a b c"]})
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "text": pd.Series([], dtype="object")})
        got = domain_llr_score(
            rd.from_pandas(raw), rd.from_pandas(empty), vocab_size=4
        ).to_pandas()
        assert got["n_invocab"].tolist() == [0]
        assert got["llr_score"].tolist() == [0.0]
