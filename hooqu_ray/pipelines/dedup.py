"""Deduplication operators for large-scale training-data pipelines.

All shapes follow the standard web-scale recipe (exact-hash partitioning,
MinHash+LSH banding, SimHash) expressed Ray-Data-first:

- ``exact_dedup``       content hash per batch → ``groupby(hash)`` shuffle →
                        first row per group (deterministic: min id).
- ``minhash_signatures``/``minhash_lsh_pairs``
                        shingle → minhash (vectorized universal hashing) →
                        explode to (band, band_hash) rows → groupby bands →
                        candidate pairs + signature-estimated Jaccard.
- ``simhash``           64-bit SimHash per doc; near-dups collide on rotated
                        16-bit bands.
- ``ngram_jaccard``     exact word-n-gram Jaccard for a candidate pair
                        (verification kernel).
- ``embedding_cosine_pairs``
                        near-duplicate vectors via random-hyperplane LSH
                        buckets → within-bucket pairwise cosine.

Only the candidate/verify machinery shuffles; signatures are a few hundred
bytes per doc, so the LSH band shuffle moves ~1% of the text volume.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _stable_text_hash64(texts: List[Optional[str]]) -> np.ndarray:
    """Deterministic 64-bit content hash (blake2b), None → 0."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if t is None:
            out[i] = 0
        else:
            out[i] = int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
            )
    return out


def _text_hash63(texts) -> np.ndarray:
    """Vectorized deterministic 63-bit content hash: polars' 64-bit string
    hash (process-stable for a fixed seed/version) masked into the int64
    range, so Ray/Arrow shuffles keep a native integer column instead of
    falling back to pickled-object extension arrays.  Nulls hash to a single
    shared value (they form one dedup group, like SQL ``GROUP BY text``)."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return np.empty(0, dtype=np.int64)
    h = pl.from_arrow(texts).hash(seed=0).to_numpy().astype(np.uint64)
    return (h & np.uint64((1 << 63) - 1)).astype(np.int64)


def _shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Hashes of word w-shingles (w consecutive words)."""
    words = text.split()
    if len(words) < w:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + w]) for i in range(len(words) - w + 1)]
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    return _stable_text_hash64(shingles)


class _AddContentHash:
    def __init__(self, text_col: str):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _text_hash63(batch.column(self.text_col))
        return batch.append_column("__content_hash", pa.array(h, pa.int64()))


class _DedupFilter:
    """Per-batch semi-join against the broadcast duplicate-winner table:
    a row survives unless its content hash belongs to a duplicate group AND
    the row is not that group's min-id winner.  The in-batch join is Arrow
    Acero (vectorized C++); the winner table ships ONCE via ``ray.put`` and
    is O(#duplicate groups) — singleton hashes (the vast majority) never
    appear in it."""

    def __init__(self, winners_ref, id_col: str):
        self.winners_ref = winners_ref
        self.id_col = id_col
        self._w: Optional[pa.Table] = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._w is None:
            import ray

            w = self.winners_ref
            self._w = w if isinstance(w, pa.Table) else ray.get(w)
        out_cols = [c for c in batch.column_names if c != "__content_hash"]
        if len(self._w) == 0 or len(batch) == 0:
            return batch.select(out_cols)
        probe = pa.table(
            {
                "__content_hash": batch.column("__content_hash"),
                "__row": pa.array(np.arange(len(batch)), pa.int64()),
                "__id": batch.column(self.id_col),
            }
        )
        j = probe.join(self._w, keys="__content_hash", join_type="left outer")
        j = j.sort_by("__row")
        winner = j.column("__winner_id")
        # or_kleene: TRUE | NULL = TRUE (no-match rows have a null winner, so
        # the equality leg is null; plain or_ would null-propagate and drop them)
        keep = pc.or_kleene(pc.is_null(winner), pc.equal(j.column("__id"), winner))
        return batch.filter(pc.fill_null(keep, False)).select(out_cols)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep one row per distinct text (deterministic representative: min id).

    Fully vectorized — no per-group Python (the round-1 ``map_groups`` paid
    ~100 µs of pandas per distinct document):

    1. 63-bit content hash per batch (vectorized polars, int64 column).
    2. One ``groupby(hash).aggregate(Min, Sum)`` over per-block pre-aggregated
       (hash, min_id, count) partials — the only all-to-all shuffle moves one
       row per (block, hash), never the text.
    3. Winners of duplicate groups only (count > 1) are collected as a
       compact Arrow table and broadcast once via ``ray.put``; a second
       streaming pass keeps each row unless it lost its duplicate group
       (per-batch Acero left join — vectorized semi-join, no driver loop).

    The broadcast is O(#duplicate groups), not O(#rows); at extreme
    duplicate cardinality shard the winner table by hash range and run the
    filter pass per shard.  The input is read twice (hash is recomputed for
    the filter pass) — both reads stream and prune to the needed columns.
    """
    import ray
    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(_AddContentHash(text_col), batch_format="pyarrow")

    def proj_combine(t: pa.Table, _id=id_col) -> pa.Table:
        # per-block combiner: the shuffle moves one row per (block, hash),
        # not one per document
        g = (
            t.select(["__content_hash", _id])
            .group_by("__content_hash", use_threads=False)
            .aggregate([(_id, "min"), ([], "count_all")])
        )
        return g.rename_columns(["__content_hash", "__winner_id", "__pcount"])

    partials = hashed.map_batches(proj_combine, batch_format="pyarrow")
    groups = partials.groupby("__content_hash").aggregate(
        Min("__winner_id"), Sum("__pcount")
    )
    # placeholder for the no-duplicates case only: the filter pass
    # short-circuits on an empty winner table, so __winner_id's type is
    # never consulted there
    empty_winners = pa.table(
        {
            "__content_hash": pa.array([], pa.int64()),
            "__winner_id": pa.array([], pa.int64()),
        }
    )

    def dup_only(t: pa.Table, _empty=empty_winners) -> pa.Table:
        if "sum(__pcount)" not in t.column_names:  # schema-less empty agg block
            return _empty
        kept = t.filter(pc.greater(t.column("sum(__pcount)"), 1))
        return kept.select(["__content_hash", "min(__winner_id)"]).rename_columns(
            ["__content_hash", "__winner_id"]
        )

    dup = groups.map_batches(dup_only, batch_format="pyarrow")
    winner_parts = [
        t for t in ray.get(dup.to_arrow_refs()) if t.num_columns and len(t)
    ]
    winner_tbl = (
        pa.concat_tables(winner_parts) if winner_parts else empty_winners
    )
    winners_ref = ray.put(winner_tbl.combine_chunks())
    return hashed.map_batches(_DedupFilter(winners_ref, id_col), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """num_perm universal hash functions over shingle hashes; deterministic
    coefficients from a seeded PCG64.  Actor-pool stage: coefficients built
    once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, shingle_w: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle_w = shingle_w

    def signature(self, text: Optional[str]) -> np.ndarray:
        if not text:
            return np.zeros(self.num_perm, dtype=np.uint64)
        sh = _shingle_hashes(text, self.shingle_w)  # (n_shingles,)
        # (num_perm, n_shingles) universal hashes, min per row
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t).tobytes() for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "signature": pa.array(sigs, pa.binary()),
            }
        )


class _ExplodeBands:
    def __init__(self, num_perm: int, bands: int, id_col: str):
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        sig_bytes = batch.column("signature").to_pylist()
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for i, sb in enumerate(sig_bytes):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_band.append(b)
                out_hash.append(int.from_bytes(h, "little"))
                out_id.append(ids[i])
                out_sig.append(sb)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.uint64()),
                self.id_col: pa.array(out_id),
                "signature": pa.array(out_sig, pa.binary()),
            }
        )


class _FilterBandHash:
    def __init__(self, hashes: frozenset):
        self.hashes = hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        value_set = pa.array(list(self.hashes), pa.uint64())
        return batch.filter(pc2.is_in(batch.column("band_hash"), value_set=value_set))


class _BucketPairs:
    """Within one (band, band_hash) bucket: all candidate pairs with
    signature-estimated Jaccard."""

    def __init__(self, id_col: str, threshold: float):
        self.id_col = id_col
        self.threshold = threshold

    def __call__(self, group):
        import pandas as pd

        n = len(group)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        ids = group[self.id_col].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group["signature"]]
        rows = []
        for i in range(n):
            for j in range(i + 1, n):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= self.threshold:
                    a, b = sorted((ids[i], ids[j]))
                    rows.append((a, b, est))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard"])


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 128, bands: int = 32,
                      threshold: float = 0.5, concurrency=None):
    """Near-duplicate candidate pairs via MinHash+LSH.

    shingle→minhash (actor pool) → band explode → groupby(band, band_hash)
    → within-bucket pairs → dedupe pairs across bands (groupby id pair)."""
    from ..util import actor_pool_size

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool_size(cap=16),
    )
    bands_ds = sigs.map_batches(
        _ExplodeBands(num_perm, bands, id_col), batch_format="pyarrow"
    ).materialize()
    # Most buckets are singletons; a vectorized count pass finds the few
    # colliding band hashes first so the per-group Python UDF only ever runs
    # on actual candidates (map_groups over all buckets is O(#docs·bands)
    # Python-group overhead otherwise).
    counts = bands_ds.groupby(["band", "band_hash"]).count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1)).select(["band_hash"]),
        batch_format="pyarrow",
    )
    hot_hashes = {r["band_hash"] for r in hot.take_all()}
    if not hot_hashes:
        import pandas as pd

        empty = pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        import ray.data as rd

        return rd.from_pandas(empty)
    hot_ds = bands_ds.map_batches(
        _FilterBandHash(frozenset(hot_hashes)), batch_format="pyarrow"
    )
    bucket_pairs = _BucketPairs(id_col, threshold)
    pairs = hot_ds.groupby(["band", "band_hash"]).map_groups(
        lambda g, _bp=bucket_pairs: _bp(g), batch_format="pandas"
    )
    # a pair can surface from several bands → keep one
    from ray.data.aggregate import Max

    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(Max("est_jaccard"))
    return uniq.map_batches(_RenameMax, batch_format="pyarrow")


def _RenameMax(batch: pa.Table) -> pa.Table:
    names = [("est_jaccard" if c == "max(est_jaccard)" else c) for c in batch.column_names]
    return batch.rename_columns(names)


def verify_pairs(ds, pairs, text_col: str = "text", id_col: str = "doc_id",
                 shingle_w: int = 3, threshold: float = 0.0):
    """Exact n-gram Jaccard verification of LSH candidate pairs.

    Only the candidate docs' texts are fetched (a filtered scan over the
    corpus — the candidate set is tiny relative to it) and broadcast; each
    pair is then verified with the exact word-shingle Jaccard.  Returns the
    pairs table + ``jaccard`` column, filtered to ``jaccard >= threshold``."""
    import pandas as pd
    import ray
    import ray.data as rd

    pair_rows = pairs.take_all()
    if not pair_rows:
        return rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}))
    wanted = sorted({r["id_a"] for r in pair_rows} | {r["id_b"] for r in pair_rows})
    wanted_arr = pa.array(wanted)
    texts_ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=wanted_arr)).select(
            [id_col, text_col]
        ),
        batch_format="pyarrow",
    )
    lookup = {r[id_col]: r[text_col] for r in texts_ds.take_all()}
    out = []
    for r in pair_rows:
        ta = lookup.get(r["id_a"])
        tb = lookup.get(r["id_b"])
        if ta is None or tb is None:
            continue  # unresolvable text must NOT "verify" as a duplicate
        j = ngram_jaccard(ta, tb, shingle_w)
        if j >= threshold:
            out.append((r["id_a"], r["id_b"], j))
    return rd.from_pandas(pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"]))


def ngram_jaccard(text_a: str, text_b: str, w: int = 3) -> float:
    """Exact word-w-gram Jaccard (candidate verification kernel).

    Texts shorter than w words contribute their full word tuple as the single
    shingle (mirroring ``_shingle_hashes``) — otherwise two completely
    different short texts would both have empty shingle sets and 'verify' as
    perfect duplicates."""

    def shingles(text: str):
        words = text.split()
        if not words:
            return set()
        if len(words) < w:
            return {tuple(words)}
        return set(zip(*[words[i:] for i in range(w)]))

    a, b = shingles(text_a), shingles(text_b)
    if not a and not b:
        return 1.0  # both genuinely empty
    return len(a & b) / max(len(a | b), 1)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes (vectorized sign-sum)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def simhash(self, text: Optional[str]) -> int:
        if not text:
            return 0
        h = _stable_text_hash64(text.split())
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
            }
        )


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       concurrency=None):
    from ..util import actor_pool_size

    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool_size(cap=16),
    )


class _SimhashBands:
    """Explode each simhash into ``n_bands`` band rows (pigeonhole: any pair
    within Hamming distance ≤ n_bands − 1 of the full 64 bits shares at
    least one exact band).  Fully vectorized (np.repeat/tile)."""

    def __init__(self, id_col: str, n_bands: int = 4):
        assert 2 <= n_bands <= 16
        self.id_col = id_col
        self.n_bands = n_bands
        width = 64 // n_bands
        self.shifts = [np.uint64(width * b) for b in range(n_bands)]
        self.masks = [
            np.uint64((1 << (64 - width * (n_bands - 1))) - 1)
            if b == n_bands - 1
            else np.uint64((1 << width) - 1)
            for b in range(n_bands)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        hashes = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(batch)
        vals = np.concatenate(
            [((hashes >> s) & m).astype(np.int64) for s, m in zip(self.shifts, self.masks)]
        )
        bands = np.repeat(np.arange(self.n_bands, dtype=np.int32), n)
        rep_ids = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids]
            * self.n_bands
        )
        return pa.table(
            {
                self.id_col: rep_ids,
                "band": pa.array(bands, pa.int32()),
                "band_val": pa.array(vals, pa.int64()),
                "simhash": pa.array(np.tile(hashes, self.n_bands), pa.uint64()),
            }
        )


class _SimhashBucketPairs:
    def __init__(self, id_col: str, max_hamming: int):
        self.id_col = id_col
        self.max_hamming = max_hamming

    def __call__(self, group):
        import pandas as pd

        n = len(group)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ids = group[self.id_col].tolist()
        hs = [int(h) for h in group["simhash"]]
        rows = []
        for i in range(n):
            for j in range(i + 1, n):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= self.max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    rows.append((a, b, d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


def simhash_near_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, concurrency=None):
    """SimHash near-duplicate pairs: signatures → band explode →
    groupby(band, band_val) buckets (hot-bucket prefilter like MinHash) →
    within-bucket Hamming verification ≤ max_hamming → pair dedup.

    Band count = max_hamming + 1 (pigeonhole guarantee: every pair within
    the requested distance shares ≥ 1 exact band); supports
    max_hamming ≤ 15 (16 bands of 4 bits)."""
    if not 0 <= max_hamming <= 15:
        raise ValueError("max_hamming must be in [0, 15] for 64-bit banding")
    from ray.data.aggregate import Min

    n_bands = max(2, max_hamming + 1)
    sigs = simhash_signatures(ds, text_col, id_col, concurrency)
    bands = sigs.map_batches(
        _SimhashBands(id_col, n_bands), batch_format="pyarrow"
    ).materialize()
    counts = bands.groupby(["band", "band_val"]).count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1)).select(["band", "band_val"]),
        batch_format="pyarrow",
    ).take_all()
    if not hot:
        import pandas as pd
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}))
    # combined key: band occupies the low 4 bits (band < 16, band_val < 2^60)
    hot_keys = pa.array([r["band_val"] * 16 + r["band"] for r in hot], pa.int64())

    def filter_hot(t: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(pc.cast(t.column("band_val"), pa.int64()), 16),
                     pc.cast(t.column("band"), pa.int64()))
        return t.filter(pc.is_in(key, value_set=hot_keys))

    hot_ds = bands.map_batches(filter_hot, batch_format="pyarrow")
    bp = _SimhashBucketPairs(id_col, max_hamming)
    pairs = hot_ds.groupby(["band", "band_val"]).map_groups(
        lambda g, _bp=bp: _bp(g), batch_format="pandas"
    )
    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming"))
    return uniq.map_batches(
        lambda t: t.rename_columns(
            [("hamming" if c == "min(hamming)" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


class _HyperplaneBucket:
    """Random-hyperplane LSH bucket id for each embedding."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 99,
                 emb_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    self.id_col: batch.column(self.id_col),
                    "bucket": pa.array([], pa.uint64()),
                    self.emb_col: batch.column(self.emb_col),
                }
            )
        emb = np.stack(batch.column(self.emb_col).to_pylist()).astype(np.float64)
        signs = (emb @ self.planes) > 0
        bucket = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "bucket": pa.array(bucket, pa.uint64()),
                self.emb_col: batch.column(self.emb_col),
            }
        )


class _BucketCosinePairs:
    def __init__(self, threshold: float, emb_col: str, id_col: str):
        self.threshold = threshold
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, group):
        import pandas as pd

        n = len(group)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = group[self.id_col].tolist()
        emb = np.stack(group[self.emb_col].tolist()).astype(np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norm, 1e-12)
        sims = emb @ emb.T
        rows = []
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= self.threshold:
                    a, b = sorted((ids[i], ids[j]))
                    rows.append((a, b, float(sims[i, j])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def embedding_cosine_pairs(ds, threshold: float = 0.9, dim: int = 64,
                           emb_col: str = "embedding", id_col: str = "vec_id"):
    """Near-duplicate embeddings: hyperplane-LSH buckets → within-bucket
    cosine ≥ threshold.  Recall is per-bucket (standard LSH tradeoff); run
    with several seeds and union for higher recall."""
    bucketed = ds.map_batches(
        _HyperplaneBucket(dim, emb_col=emb_col, id_col=id_col), batch_format="pyarrow"
    )
    bucket_pairs = _BucketCosinePairs(threshold, emb_col, id_col)
    return bucketed.groupby("bucket").map_groups(
        lambda g, _bp=bucket_pairs: _bp(g), batch_format="pandas"
    )
