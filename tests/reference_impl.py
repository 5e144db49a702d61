"""Independent single-process reference implementation of the transcript
quality-filter + scrub pipeline (pure pandas + Python re + dict counting —
no pyarrow kernels, no numpy segment tricks).

This is the "reference suite" the north_rule measures against: per-turn
keep/drop labels and scrubbed text must match the Ray pipeline's output
(F1 ≥ 0.99 required; exact agreement expected).  Only the frozen constants
in ``hooqu_ray.stages.spec`` are shared; every computation here is written
independently.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from hooqu_ray.stages import spec

_SYMBOL_RE = re.compile(r"[^0-9A-Za-z_\s]", re.ASCII)
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _ascii_lower(text: str) -> str:
    return text.translate(_ASCII_LOWER)
_STOP_RE = re.compile(r"\b(?:%s)\b" % "|".join(sorted(spec.STOPWORDS)))
_TOX_SEARCH = re.compile(r"\b(?:%s)\b" % "|".join(spec.TOXIC_WORDS))


def _codes(text: str):
    # ASCII-only lowercase by spec (see hooqu_ray.stages.models._byte_codes)
    return [b if b < 128 else 127 for b in _ascii_lower(text).encode("utf-8")]


class OracleModels:
    """Dict-based rebuild of the char-ngram models from the same corpora."""

    def __init__(self):
        # bigram LM (English)
        codes = _codes(spec.LM_CORPUS_EN)
        big = Counter(zip(codes[:-1], codes[1:]))
        row_tot = Counter()
        for (a, _b), c in big.items():
            row_tot[a] += c
        s = spec.BIGRAM_SMOOTHING
        self._big = big
        self._row_tot = row_tot
        self._s = s
        # trigram language profiles
        self._tri = {}
        self._tri_tot = {}
        for lang, corpus in spec.LM_CORPORA.items():
            cs = _codes(corpus)
            cnt = Counter(
                spec.trigram_bucket(a, b, c) for a, b, c in zip(cs, cs[1:], cs[2:])
            )
            self._tri[lang] = cnt
            self._tri_tot[lang] = sum(cnt.values())

    def ppl(self, text) -> float:
        if not isinstance(text, str):
            return 1.0
        cs = _codes(text)
        if len(cs) < 2:
            return 1.0
        s = self._s
        total = 0.0
        for a, b in zip(cs[:-1], cs[1:]):
            p = (self._big.get((a, b), 0) + s) / (self._row_tot.get(a, 0) + s * spec.N_CHAR_BUCKETS)
            total += -math.log(p)
        return math.exp(total / (len(cs) - 1))

    def lang(self, text) -> str:
        if not isinstance(text, str):
            return spec.LANGS[0]
        cs = _codes(text)
        if len(cs) < 3:
            return spec.LANGS[0]
        best_lang, best_score = None, None
        s = spec.TRIGRAM_SMOOTHING
        for lang in self._tri:
            tot = self._tri_tot[lang]
            acc = 0.0
            for a, b, c in zip(cs, cs[1:], cs[2:]):
                bucket = spec.trigram_bucket(a, b, c)
                p = (self._tri[lang].get(bucket, 0) + s) / (tot + s * spec.TRIGRAM_BUCKETS)
                acc += math.log(p)
            score = acc / (len(cs) - 2)
            if best_score is None or score > best_score:
                best_lang, best_score = lang, score
        return best_lang


def oracle_scrub(text):
    if not isinstance(text, str):
        return None
    text = spec.EMAIL.sub(spec.EMAIL_TOKEN, text)
    text = spec.CREDITCARD.sub(spec.CC_TOKEN, text)
    text = spec.TOXIC_RE.sub(spec.TOX_TOKEN, text)
    return text


def oracle_turn_keep(text, models: OracleModels) -> bool:
    if not isinstance(text, str) or len(text) < spec.MIN_CHARS:
        return False
    words = text.split()
    n_words = len(words)
    if not (spec.MIN_WORDS <= n_words <= spec.MAX_WORDS):
        return False
    mean_wl = sum(len(w) for w in words) / n_words
    if not (spec.MIN_MEAN_WORD_LEN <= mean_wl <= spec.MAX_MEAN_WORD_LEN):
        return False
    n_chars = len(text)
    n_sym = len(_SYMBOL_RE.findall(text))
    if n_sym / n_chars > spec.MAX_SYMBOL_RATIO:
        return False
    if n_words >= 3:
        pairs = list(zip(words[:-1], words[1:]))
        dups = 0
        seen = set()
        for p in pairs:
            if p in seen:
                dups += 1
            else:
                seen.add(p)
        if dups / len(pairs) > spec.MAX_DUP_2GRAM_FRACTION:
            return False
    if n_words >= spec.STOPWORD_MIN_WORDS:
        n_stop = len(_STOP_RE.findall(_ascii_lower(text)))
        if n_stop / n_words < spec.MIN_STOPWORD_RATIO:
            return False
    if models.lang(text) != "en":
        return False
    if models.ppl(text) > spec.MAX_PERPLEXITY:
        return False
    if _TOX_SEARCH.search(_ascii_lower(text)):
        return False
    return True


def oracle_pipeline(df: pd.DataFrame) -> pd.DataFrame:
    """Full oracle: per-turn keep + scrubbed text + conversation rules.

    Input: the transcript frame; output: same rows plus ``keep`` and
    ``text_scrubbed``, in stable (conv_id, turn_idx) order."""
    models = OracleModels()
    df = df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    df["keep_turn"] = [oracle_turn_keep(t, models) for t in df["text"]]
    df["text_scrubbed"] = [oracle_scrub(t) for t in df["text"]]

    conv_ok = {}
    for conv, grp in df.groupby("conv_id"):
        kept = int(grp["keep_turn"].sum())
        total = len(grp)
        conv_ok[conv] = kept >= spec.CONV_MIN_KEPT_TURNS and kept / total >= spec.CONV_MIN_KEPT_FRACTION
    df["keep"] = df["keep_turn"] & df["conv_id"].map(conv_ok)
    return df
