"""Hypothesis differentials for the hygiene-tier pure kernels (no Ray):
chunk_stage and the decontam n-gram hasher vs straightforward Python."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

HYPO = settings(max_examples=60, deadline=None)

# texts over a small alphabet incl. whitespace runs, unicode, empties, None
_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=" \t\nabÆ日1._'", max_size=40),
    ),
    min_size=0,
    max_size=8,
)


def _py_chunks(text, size, overlap):
    toks = (text or "").split()
    step = size - overlap
    out, s = [], 0
    while s < len(toks):
        out.append(" ".join(toks[s : s + size]))
        s += step
    return out


class TestChunkStageProperties:
    @HYPO
    @given(_texts, st.integers(2, 7), st.integers(0, 5))
    def test_matches_python(self, texts, size, overlap):
        from hooqu_ray.pipelines.chunking import chunk_stage

        overlap = min(overlap, size - 1)
        t = pa.table(
            {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
        )
        got = chunk_stage(t, size=size, overlap=overlap).to_pandas()
        exp = [
            (d, i, c, len(c.split()))
            for d, txt in enumerate(texts)
            for i, c in enumerate(_py_chunks(txt, size, overlap))
        ]
        rows = list(
            got.sort_values(["doc_id", "chunk_idx"])[
                ["doc_id", "chunk_idx", "chunk_text", "n_tokens"]
            ].itertuples(index=False, name=None)
        )
        assert rows == exp


class TestNgramHashProperties:
    @HYPO
    @given(_texts, st.integers(1, 4))
    def test_position_counts_and_equality(self, texts, n):
        """Per-doc n-gram position counts match max(len(toks)-n+1, 0), and
        equal token windows hash equal / distinct windows hash distinct
        (whp) — across documents."""
        from hooqu_ray.pipelines.decontam import _ngram_hashes

        import pyarrow.compute as pc

        arr = pc.fill_null(pa.array(texts, pa.string()), "")
        g, parent, n_rows = _ngram_hashes(arr, n)
        assert n_rows == len(texts)
        counts = np.bincount(parent, minlength=len(texts)) if parent.size else np.zeros(len(texts), int)
        grams_by_doc = []
        for txt in texts:
            toks = (txt or "").split()
            grams_by_doc.append(
                [tuple(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))]
            )
        assert counts.tolist() == [len(gs) for gs in grams_by_doc]
        # hash equality == token-window equality (no false splits; collisions
        # at these sizes are ~2^-63)
        flat = [g for gs in grams_by_doc for g in gs]
        assert len(flat) == g.size
        seen = {}
        for window, h in zip(flat, g.tolist()):
            if window in seen:
                assert seen[window] == h
            else:
                seen[window] = h
        assert len(set(seen.values())) == len(seen)
