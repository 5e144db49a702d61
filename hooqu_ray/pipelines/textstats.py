"""Text analysis operators over a documents table.

Vectorized per-batch stages: token counting (``\\S+`` runs), quality scoring
(length/symbol/stopword heuristics reused from the transcript stage),
language-ID (actor-pool char-trigram model), and document fingerprinting
(md5 + 64-bit rolling hash)."""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.heuristics import SYMBOL_PATTERN, STOPWORD_PATTERN
from ..stages.models import TrigramLangID

TOKEN_PATTERN = r"\S+"


def token_count_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch.column(text_col)
    n_tok = pc.fill_null(pc.count_substring_regex(text, pattern=TOKEN_PATTERN), 0)
    return batch.append_column("n_tokens", pc.cast(n_tok, pa.int64()))


def quality_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality features: n_chars, symbol_ratio, stopword_ratio."""
    text = batch.column(text_col)
    n_chars = pc.fill_null(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    n_sym = pc.fill_null(
        pc.count_substring_regex(text, pattern=SYMBOL_PATTERN), 0
    ).to_numpy(zero_copy_only=False)
    n_tok = pc.fill_null(
        pc.count_substring_regex(text, pattern=TOKEN_PATTERN), 0
    ).to_numpy(zero_copy_only=False)
    n_stop = pc.fill_null(
        pc.count_substring_regex(pc.utf8_lower(text), pattern=STOPWORD_PATTERN), 0
    ).to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        symbol_ratio = np.where(n_chars > 0, n_sym / np.maximum(n_chars, 1), 0.0)
        stopword_ratio = np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0)
    return (
        batch.append_column("q_n_chars", pa.array(n_chars, pa.int64()))
        .append_column("q_symbol_ratio", pa.array(symbol_ratio, pa.float64()))
        .append_column("q_stopword_ratio", pa.array(stopword_ratio, pa.float64()))
    )


class LangIdStage:
    """Actor-pool language ID (model built once per actor).  Scores via the
    zero-copy Arrow byte-codes path (``_byte_codes_arrow``) — the same kernel
    the flagship's QualityScorer uses — instead of ``to_pylist()`` +
    per-row ``str.encode``."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.model = TrigramLangID()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.models import _byte_codes_arrow

        langs, margin = self.model.predict_codes(
            *_byte_codes_arrow(batch.column(self.text_col))
        )
        return batch.append_column("pred_lang", pa.array(langs, pa.string())).append_column(
            "pred_lang_margin", pa.array(margin, pa.float64())
        )


_RK_PRIME = 1099511628211  # odd 64-bit multiplier (the FNV prime)
_MASK64 = (1 << 64) - 1


def rolling_hash64(text: Optional[str]) -> int:
    """Rabin-Karp polynomial rolling hash over utf-8 bytes (document
    fingerprint): ``h = h * P + b`` per byte, mod 2^64.  Scalar REFERENCE
    implementation — the hot path is the byte-exact vectorized
    ``rolling_hash64_batch``."""
    if text is None:
        return 0
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _RK_PRIME + b) & _MASK64
    return h


def rolling_hash64_batch(texts) -> np.ndarray:
    """Vectorized Rabin-Karp over a whole string array, byte-identical to
    ``rolling_hash64``: ``h = Σ b_j · P^(L-1-j) mod 2^64`` computed with a
    power table + one ``np.add.reduceat`` segment sum — no Python per byte
    (the round-1 FNV-1a loop paid ~60 ns/byte of interpreter time)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    binary = pc.cast(texts, pa.large_binary())
    if isinstance(binary, pa.ChunkedArray):
        binary = binary.combine_chunks()
    offs = np.frombuffer(binary.buffers()[1], dtype=np.int64)[
        binary.offset : binary.offset + n + 1
    ]
    data = np.frombuffer(binary.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    valid = pc.is_valid(binary).to_numpy(zero_copy_only=False)
    total = int(offs[-1] - offs[0])
    if total == 0:
        return out
    maxlen = int(lens.max())
    pw = np.empty(maxlen, dtype=np.uint64)
    pw[0] = 1
    if maxlen > 1:
        np.multiply.accumulate(
            np.full(maxlen - 1, _RK_PRIME, dtype=np.uint64), out=pw[1:]
        )
    # exponent of each byte = (its row's end offset - 1) - global position
    pos = np.arange(offs[0], offs[-1], dtype=np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    exp = (offs[1:][row_of] - 1 - pos).astype(np.int64)
    contrib = data[offs[0] : offs[-1]].astype(np.uint64) * pw[exp]
    nonempty = lens > 0
    starts = (offs[:-1] - offs[0])[nonempty]
    sums = np.add.reduceat(contrib, starts)
    out[np.flatnonzero(nonempty)] = sums
    out[~valid] = 0  # null text → 0, like the scalar
    return out


def fingerprint_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 (hex) + rolling-hash fingerprints per document."""
    texts = batch.column(text_col).to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    col = batch.column(text_col)
    rolls = rolling_hash64_batch(col)
    return batch.append_column("md5", pa.array(md5s, pa.string())).append_column(
        "fingerprint", pa.array(rolls, pa.uint64())
    )


def _block_ngram_counts(t: pa.Table, text_col: str, n: int) -> pa.Table:
    """Per-block combiner: (ngram, n) partial counts.  One Arrow
    split/flatten pass; n-gram strings built with a single vectorized
    ``binary_join_element_wise`` over position-shifted token views — no
    Python per token."""
    texts = t.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    empty = pa.table(
        {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if len(texts) == 0:
        return empty
    words = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return empty
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.invert(pc.equal(flat, "")).to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(keep))
    tp = parent[keep]
    if len(toks) < n:
        return empty
    # n-gram start positions whose first and last token share a document
    pos = np.flatnonzero(tp[: len(toks) - n + 1] == tp[n - 1 :])
    if pos.size == 0:
        return empty
    parts = [toks.take(pa.array(pos + d)) for d in range(n)]
    ngrams = pc.binary_join_element_wise(*parts, " ")
    g = (
        pa.table({"ngram": ngrams})
        .group_by("ngram", use_threads=False)
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["ngram", "n"])


def top_ngrams(ds, text_col: str = "text", n: int = 2, k: int = 20):
    """Global top-k word n-grams by corpus frequency (ties broken by the
    n-gram string ascending).

    Combiner-first: per-block partial counts shrink before the one
    ``groupby(ngram)`` shuffle; after the aggregate each n-gram lives in
    exactly one block, so a per-block local top-k plus a driver merge of
    the #blocks × k partials yields the exact global answer without sorting
    the full distinct-n-gram table.  Returns an Arrow table (ngram, n)."""
    from ray.data.aggregate import Sum

    from ..util import collect_arrow

    partials = ds.map_batches(
        lambda t, _c=text_col, _n=n: _block_ngram_counts(t, _c, _n),
        batch_format="pyarrow",
    )
    totals = partials.groupby("ngram").aggregate(Sum("n"))

    def local_topk(t: pa.Table) -> pa.Table:
        if "sum(n)" not in t.column_names:  # schema-less empty agg block
            return pa.table(
                {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        df = t.rename_columns(["ngram", "n"]).to_pandas()
        df = df.sort_values(["n", "ngram"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    merged = collect_arrow(
        totals.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    )
    if merged is None:
        return pa.table(
            {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    df = merged.to_pandas().sort_values(
        ["n", "ngram"], ascending=[False, True], kind="mergesort", ignore_index=True
    )
    return pa.Table.from_pandas(df.head(k), preserve_index=False)
