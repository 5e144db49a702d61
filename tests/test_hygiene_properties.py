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


# -- transcript-kernel differentials (pure pa.Table kernels, no Ray) --------

_turns = st.lists(
    st.tuples(
        st.sampled_from(["c0", "c1", "c2"]),                    # conv
        st.integers(0, 50),                                      # idx
        st.sampled_from(["user", "assistant", None]),            # role
        st.one_of(st.none(),                                     # text
                  st.text(alphabet=" abX", min_size=0, max_size=12)),
    ),
    min_size=0, max_size=40,
    unique_by=lambda r: (r[0], r[1]),  # (conv, idx) unique, like real data
)


def _turn_table(rows):
    rows = sorted(rows)  # kernels require (conv, idx)-sorted input
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })


class TestMergeRunsKernelDifferential:
    @HYPO
    @given(_turns)
    def test_matches_pandas(self, rows):
        from hooqu_ray.pipelines.transcripts import _merge_runs_table

        t = _turn_table(rows)
        got = _merge_runs_table(
            t, "conv_id", "turn_idx", "role", "text", None, "\n").to_pandas()

        # independent pandas re-derivation
        df = t.to_pandas()
        exp_rows = []
        prev = None
        for _, r in df.iterrows():
            key = (r.conv_id, r.role if r.role is not None else "\0NULL")
            if prev != key:
                exp_rows.append([r.conv_id, r.turn_idx, r.role, [], 0])
                prev = key
            exp_rows[-1][3].append(r.text if r.text is not None else "")
            exp_rows[-1][4] += 1
        assert got["conv_id"].tolist() == [e[0] for e in exp_rows]
        assert got["turn_idx"].tolist() == [e[1] for e in exp_rows]
        assert got["text"].tolist() == ["\n".join(e[3]) for e in exp_rows]
        assert got["n_merged"].tolist() == [e[4] for e in exp_rows]


class TestContextExamplesKernelDifferential:
    @HYPO
    @given(_turns, st.integers(0, 12))
    def test_matches_bruteforce(self, rows, budget):
        from hooqu_ray.pipelines.transcripts import _context_examples_table

        t = _turn_table(rows)
        got = _context_examples_table(
            t, "conv_id", "turn_idx", "role", "text", "assistant", budget,
            "\n").to_pandas()

        df = t.to_pandas()
        df["ntok"] = [len((x or "").split()) for x in df["text"]]
        exp = []
        for conv, g in df.groupby("conv_id", sort=True):
            g = g.reset_index(drop=True)
            for i in range(len(g)):
                if g.role[i] != "assistant" or g.ntok[i] > budget:
                    continue
                j = i
                tot = int(g.ntok[i])
                while j > 0 and tot + g.ntok[j - 1] <= budget:
                    j -= 1
                    tot += int(g.ntok[j])
                exp.append((conv, int(g.turn_idx[i]),
                            "\n".join((x or "") for x in g.text[j:i]),
                            g.text[i] or "", i - j, tot))
        got_t = list(got.itertuples(index=False, name=None))
        assert sorted(got_t) == sorted(exp)


def _py_scrub_one(text, hot, n):
    """Naive per-doc span removal given the hot gram-string set."""
    if text is None:
        return None, 0
    toks = text.split()
    cov = [False] * len(toks)
    for i in range(len(toks) - n + 1):
        if " ".join(toks[i:i + n]) in hot:
            for d in range(n):
                cov[i + d] = True
    nr = sum(cov)
    return (" ".join(tk for tk, c in zip(toks, cov) if not c)
            if nr else text), nr


class TestSpanScrubberProperties:
    """_SpanScrubber (the scrub_dup_ngrams rewrite kernel) vs naive Python
    over adversarial small-alphabet texts — duplicates, overlapping spans,
    whitespace runs, unicode, empties, None."""

    @HYPO
    @given(_texts, st.integers(1, 3))
    def test_matches_python(self, texts, n):
        from collections import Counter

        from hooqu_ray.pipelines.decontam import (
            _SpanScrubber, _ngram_hashes)

        counts = Counter()
        for txt in texts:
            toks = (txt or "").split()
            counts.update(" ".join(toks[i:i + n])
                          for i in range(len(toks) - n + 1))
        hot = {g for g, c in counts.items() if c >= 2}
        if hot:
            h, _, _ = _ngram_hashes(pa.array(sorted(hot), pa.string()), n)
            shards = [np.sort(np.unique(h))]
        else:
            shards = [np.empty(0, np.uint64)]
        t = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
        got = _SpanScrubber(shards, "text", n)(t)
        exp = [_py_scrub_one(txt, hot, n) for txt in texts]
        assert got.column("text").to_pylist() == [e[0] for e in exp]
        assert got.column("n_removed").to_pylist() == [e[1] for e in exp]
