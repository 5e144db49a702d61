"""Bloom-filter incremental dedup: filter a NEW shard of documents against
an EXISTING corpus's content-hash set without materializing the exact set.

The cross-run primitive a 100-TB ingest pipeline needs: the already-
processed corpus is summarized once into an m-bit Bloom bitmap (fixed
size, e.g. 2^30 bits = 128 MiB for ~10^8 keys at ~1% FP), the bitmap is
broadcast via ``ray.put`` (one zero-copy plasma read per worker), and the
new shard streams through a vectorized membership probe.  Guarantees:

- **No false negatives**: a key present in the corpus is ALWAYS flagged
  present — every row the filter keeps is genuinely new.
- False positives (genuinely-new rows dropped) at the standard
  ``(1 − e^{−kn/m})^k`` rate — size ``m_bits`` to the corpus key count.

Construction is scale-safe: each block reduces to ONE packed-bitmap row
(``map_batches`` combiner, keys never leave their block), and the rows
are OR-merged in a distributed TREE (``batch_size=fanout`` passes, each
task ORs ≤ fanout bitmaps into one) — the driver only ever sees the
final ≤ fanout bitmaps, never O(#blocks) of them.

Hashing is ``util.stable_hash64`` (process-stable) + Kirsch-Mitzenmacher
double hashing for the k probe positions, so a filter built in one run
is bit-identical in any other — checkpointable and shippable between
pipeline stages.

The reference (mfcabrera/hooqu) has no sketch of this kind (its only
sketches are the declared-but-unimplemented approx metrics — SURVEY
§2.3); engine-extension tier, cf. ``analyzers/sketches.py`` for the
HLL/t-digest counterparts on the metrics side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX_ODD = np.uint64(0x9E3779B97F4A7C15)


def _probe_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing: pos_i = h1 + i*h2 mod m
    (h2 forced odd so all k probes are distinct for power-of-two m)."""
    h1 = h
    h2 = ((h ^ (h >> np.uint64(33))) * _MIX_ODD) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    """Set bit positions in a packed uint64 bitmap (in place)."""
    flat = pos.ravel()
    np.bitwise_or.at(
        bitmap, (flat >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (flat & np.uint64(63)),
    )


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Row mask: True where ALL k probe bits are set (membership claim)."""
    word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
    bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
    return bit.all(axis=1)


def build_bloom(ds, col: str, *, m_bits: int = 1 << 22, k: int = 4,
                fanout: int = 64) -> np.ndarray:
    """Build a packed Bloom bitmap (numpy uint64 array, ``m_bits / 64``
    words) over ``stable_hash64(ds[col])``.  ``m_bits`` must be a power of
    two.  Per-block bitmap combiner + distributed tree-OR (see module
    docstring); the returned array is ready for ``ray.put`` +
    :class:`BloomNewFilter`."""
    from ..util import stable_hash64

    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    n_words = m_bits // 64

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(n_words, dtype=np.uint64)
        if col in t.column_names and len(t):
            h = stable_hash64(t.column(col))
            _set_bits(bm, _probe_positions(h, m_bits, k))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    def or_batch(t: pa.Table) -> pa.Table:
        if "bm" not in t.column_names or len(t) == 0:
            return pa.table({"bm": pa.array([], pa.large_binary())})
        acc = np.zeros(n_words, dtype=np.uint64)
        for buf in t.column("bm"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.large_binary())})

    from ..util import tree_reduce

    merged = tree_reduce(
        ds.map_batches(block_bitmap, batch_format="pyarrow", batch_size=None),
        or_batch, fanout=fanout,
    )
    if merged is None or len(merged) == 0:
        return np.zeros(n_words, dtype=np.uint64)
    return np.frombuffer(merged.column("bm")[0].as_py(), dtype=np.uint64).copy()


class BloomNewFilter:
    """``map_batches`` stage: keep only rows whose ``col`` key is ABSENT
    from a broadcast Bloom bitmap — i.e. guaranteed-new rows (no false
    negatives; a small FP fraction of genuinely-new rows is dropped).
    ``invert=True`` keeps the claimed-present rows instead (candidate
    duplicates for exact re-verification)."""

    def __init__(self, bloom_ref, col: str, *, m_bits: int = 1 << 22,
                 k: int = 4, invert: bool = False):
        self.bloom_ref = bloom_ref
        self.col = col
        self.m_bits = m_bits
        self.k = k
        self.invert = invert
        self._bm = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._bm is None:
            import ray

            obj = self.bloom_ref
            self._bm = obj if isinstance(obj, np.ndarray) else ray.get(obj)
        if self.col not in t.column_names or len(t) == 0:
            return t
        from ..util import stable_hash64

        h = stable_hash64(t.column(self.col))
        present = _test_bits(self._bm, _probe_positions(h, self.m_bits, self.k))
        mask = present if self.invert else ~present
        return t.filter(pa.array(mask))


def bloom_new_rows(new_ds, corpus_ds, col: str, *, m_bits: int = 1 << 22,
                   k: int = 4):
    """End-to-end incremental dedup: summarize ``corpus_ds[col]`` into a
    Bloom bitmap and stream ``new_ds`` through the absent-key filter.
    Returns the guaranteed-new rows of ``new_ds``."""
    import ray

    bm = build_bloom(corpus_ds, col, m_bits=m_bits, k=k)
    ref = ray.put(bm)
    return new_ds.map_batches(
        BloomNewFilter(ref, col, m_bits=m_bits, k=k), batch_format="pyarrow"
    )
