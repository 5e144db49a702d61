"""Broadcast semi/anti joins.

The reference has no join surface at all (SURVEY §2.3 "Joins / lookups:
none"); a large-scale pipeline needs at least the filter-joins.  Ray 2.49's
``Dataset.join`` is unusable in hot paths (its hash partitioner is a per-row
Python loop and it crashes on empty partitions — see CLAUDE.md), so the
small-side joins are expressed as a broadcast key set + a streaming
``pc.is_in`` filter: the set ships once via ``ray.put`` and every batch is
probed by a vectorized C hash lookup.

The small side must fit in a worker's heap; at larger key cardinality shard
the set by hash range and union the per-shard passes (or fall back to a
bucketed groupby join).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..util import BroadcastIsInFilter


def _key_array(keys, key_col: Optional[str]) -> pa.Array:
    """Normalize the small side to a deduplicated Arrow array of keys."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(keys, pa.Array):
        return pc.unique(keys)
    if isinstance(keys, pa.Table):
        if key_col is None:
            raise ValueError("key_col is required when keys is a Table")
        return pc.unique(keys.column(key_col).combine_chunks())
    if hasattr(keys, "to_arrow_refs"):  # ray.data.Dataset small side
        from ..util import collect_arrow

        tbl = collect_arrow(keys)
        if tbl is None:
            return pa.array([])
        col = key_col or tbl.column_names[0]
        return pc.unique(tbl.column(col).combine_chunks())
    return pc.unique(pa.array(list(keys)))


def semi_join(ds, keys, col: str, key_col: Optional[str] = None):
    """Rows of ``ds`` whose ``col`` appears in the (small) key side.

    ``keys``: an Arrow array/table, a Python iterable, or a small
    ``ray.data.Dataset`` (collected to a compact key array)."""
    import ray

    ref = ray.put(_key_array(keys, key_col))
    return ds.map_batches(BroadcastIsInFilter(ref, col), batch_format="pyarrow")


def anti_join(ds, keys, col: str, key_col: Optional[str] = None):
    """Rows of ``ds`` whose ``col`` does NOT appear in the (small) key side."""
    import ray

    ref = ray.put(_key_array(keys, key_col))
    return ds.map_batches(
        BroadcastIsInFilter(ref, col, invert=True), batch_format="pyarrow"
    )


def _dim_table(dim, dim_key: str) -> pa.Table:
    """Normalize the dimension side to one local Arrow table with a UNIQUE,
    non-null key column (a lookup join is only well-defined against a
    primary key — duplicate keys would silently multiply fact rows in SQL
    but can only pick one arbitrary match here, so they are an error)."""
    if hasattr(dim, "to_arrow_refs"):  # ray.data.Dataset small side
        from ..util import collect_arrow

        dim = collect_arrow(dim)
        if dim is None:
            dim = pa.table({dim_key: pa.array([])})
    elif not isinstance(dim, pa.Table):
        dim = pa.Table.from_pandas(dim, preserve_index=False)
    dim = dim.combine_chunks()
    keys = dim.column(dim_key)
    if keys.null_count:
        dim = dim.filter(pc.is_valid(keys))
        keys = dim.column(dim_key)
    if len(pc.unique(keys)) != len(keys):
        raise ValueError(
            f"enrich_join: dimension key {dim_key!r} has duplicate values"
        )
    return dim


class _EnrichBatch:
    """``map_batches`` stage: vectorized dictionary lookup of a broadcast
    dim table.  ``pc.index_in`` maps each fact key to its dim row (null for
    a miss), ``take`` gathers the dim columns — null indices gather nulls,
    which is exactly LEFT-join semantics; ``how='inner'`` drops misses."""

    def __init__(self, dim_ref, on: str, dim_key: str, cols, how: str):
        self.dim_ref = dim_ref
        self.on = on
        self.dim_key = dim_key
        self.cols = cols
        self.how = how
        self._dim = None
        self._keys = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._dim is None:
            import ray

            obj = self.dim_ref
            self._dim = obj if isinstance(obj, pa.Table) else ray.get(obj)
            self._keys = self._dim.column(self.dim_key).combine_chunks()
        idx = pc.index_in(t.column(self.on), value_set=self._keys)
        if self.how == "inner":
            mask = pc.is_valid(idx)
            t = t.filter(mask)
            idx = idx.filter(mask)
        for c in self.cols:
            t = t.append_column(c, self._dim.column(c).take(idx))
        return t


def enrich_join(ds, dim, on: str, dim_key: str, cols, how: str = "left"):
    """Dimension-enrichment (broadcast lookup) join: append ``cols`` of a
    small unique-keyed ``dim`` table to every fact row whose ``on`` value
    matches ``dim_key`` (``how='left'`` keeps misses with nulls,
    ``'inner'`` drops them) — the star-schema fact→dim join.

    The dim table ships ONCE via ``ray.put`` (zero-copy plasma read per
    worker); each fact batch pays one vectorized ``index_in`` + ``take``
    per appended column, and the fact side never shuffles.  The dim side
    must fit in a worker's heap — for a larger dim side shard it by key
    hash range and union per-shard passes (``util.shard_codes``), or
    co-partition both sides by key instead."""
    import ray

    if how not in ("left", "inner"):
        raise ValueError(f"enrich_join: how must be 'left' or 'inner', got {how!r}")
    dim_tbl = _dim_table(dim, dim_key)
    cols = list(cols)
    missing = [c for c in cols if c not in dim_tbl.column_names]
    if missing:
        raise KeyError(f"enrich_join: dim columns not found: {missing}")
    ref = ray.put(dim_tbl.select([dim_key, *cols]))
    return ds.map_batches(
        _EnrichBatch(ref, on, dim_key, cols, how), batch_format="pyarrow"
    )


def referential_integrity(child_ds, parent_ds, fk: str, pk: str) -> float:
    """Fraction of child rows whose foreign key exists in the parent's key
    set (a null foreign key is a violation, matching SQL ``EXISTS``).

    The parent key set is collected once as a deduplicated Arrow array and
    broadcast; the child streams through one counting pass (per-batch
    ``isin_mask`` + two int partials summed on the driver) — no shuffle of
    either table.  Returns NaN for an empty child."""
    import ray

    from ..util import collect_arrow, isin_mask

    keys = _key_array(parent_ds, pk)
    ref = ray.put(keys)

    class _CountMatches:
        def __init__(self, values_ref):
            self.values_ref = values_ref
            self._values = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._values is None:
                obj = self.values_ref
                self._values = obj if isinstance(obj, pa.Array) else ray.get(obj)
            mask = isin_mask(t.column(fk), self._values)
            matched = pc.sum(pc.cast(pc.fill_null(mask, False), pa.int64())).as_py() or 0
            return pa.table(
                {
                    "matched": pa.array([matched], pa.int64()),
                    "total": pa.array([len(t)], pa.int64()),
                }
            )

    counts = collect_arrow(
        child_ds.map_batches(_CountMatches(ref), batch_format="pyarrow")
    )
    if counts is None:
        return float("nan")
    total = pc.sum(counts.column("total")).as_py() or 0
    if total == 0:
        return float("nan")
    matched = pc.sum(counts.column("matched")).as_py() or 0
    return matched / total


def _filler_array(typ: pa.DataType, n: int) -> pa.Array:
    """Type-preserving filler column for the cross-side slots of the
    hash-join union (the values are NEVER read — the ``__slot`` tag filters
    them out before the per-bucket merge).  A plain ``pa.nulls`` would work
    for Arrow blocks, but Ray's shuffle may represent blocks as pandas, and
    an ALL-null int64 column silently promotes to float64 there (precision
    loss above 2^53); a constant non-null filler keeps the dtype exact."""
    try:
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            return pa.repeat(pa.scalar(0, typ), n)
        if pa.types.is_boolean(typ):
            return pa.repeat(pa.scalar(False, typ), n)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return pa.repeat(pa.scalar("", typ), n)
        if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            return pa.repeat(pa.scalar(b"", typ), n)
        if pa.types.is_timestamp(typ) or pa.types.is_date(typ) or pa.types.is_time(typ):
            return pa.repeat(pa.scalar(0, pa.int64()).cast(typ), n)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):  # pragma: no cover
        pass
    return pa.nulls(n, typ)  # exotic types: accept pandas promotion


def hash_join(left, right, on: str, right_on: Optional[str] = None,
              how: str = "inner", suffix: str = "_r", n_buckets: int = 64,
              bloom_prefilter: Optional[str] = None,
              bloom_m_bits: int = 1 << 22,
              salt_keys=None, salt_factor: int = 8):
    """General distributed equi-join of TWO LARGE datasets — the exchange
    (shuffle) join Ray Data 2.49 lacks a usable native form of (its
    ``Dataset.join`` hash-partitions via a per-row Python loop and crashes
    on empty partitions; see CLAUDE.md).

    Both sides are tagged with a deterministic key-hash bucket
    (``util.shard_codes``), unioned under one schema (each side carries
    type-preserving filler values for the other side's columns), and
    ``groupby(bucket)`` brings co-keyed rows together; each bucket then
    runs one local vectorized pandas merge.  Only the two projected tables
    shuffle, once each.  ``how``: ``'inner'``, ``'left'``, ``'right'`` or
    ``'full'``.  Null join keys never match (SQL semantics, including in
    the outer forms — pandas merge would pair NaN with NaN, so null-key
    rows are split out of the merge and re-appended unmatched on the
    retaining side); ``on`` is coalesced across sides (SQL ``USING``), so
    right-only rows still carry their key.

    The right key column is dropped from the output (SQL ``USING``);
    other right columns colliding with a left name get ``suffix``.

    Scale notes — the partitioning assumptions this relies on:
    - Every row of key *k* lands in bucket ``hash(k) % n_buckets``; one
      bucket must fit a worker's heap (size ``n_buckets`` to the data).
      A single SKEWED hot key cannot be split across buckets (join
      correctness requires co-location): salt-and-replicate it upstream
      or use :func:`enrich_join` when one side is broadcastable.
    - Many-to-many keys multiply output rows inside the bucket merge,
      exactly as in SQL.
    - Column dtypes with REAL nulls follow pandas block promotion
      (int64+null → float64), matching a DuckDB ``.df()`` oracle.

    ``salt_keys`` + ``salt_factor``: split each listed HOT key across
    ``salt_factor`` sub-buckets — left rows of a hot key take a
    deterministic salt in ``[0, S)`` (bucket = key-hash + salt) and the
    right side REPLICATES its hot-key rows once per salt, so every
    (key, salt) pair still co-locates and the hot key's work spreads over
    S buckets instead of melting one task.  Only valid for ``how ∈
    {inner, left}`` (a replicated right row that found no match would
    otherwise appear S times); find candidates with
    :func:`detect_hot_keys` (count-min heavy hitters).  Null keys are
    never hot.

    ``bloom_prefilter`` (``'left'``, ``'right'`` or ``'both'``): before the
    exchange, summarize the OTHER side's keys into a Bloom bitmap
    (``pipelines/bloom.py``, ``bloom_m_bits`` sized to its key count) and
    drop rows that provably cannot match.  A 100-TB lever for SELECTIVE
    joins: the dropped rows never enter the shuffle.  Bloom has no false
    negatives, so results are exactly unchanged; a side may only be
    prefiltered when its unmatched rows wouldn't be retained anyway
    (left needs ``how ∈ {inner, right}``, right needs ``how ∈ {inner,
    left}`` — violating that raises).  Costs one extra pruned scan of the
    summarized side; off by default."""
    import ray

    from ..pipelines.bloom import _probe_positions, _test_bits, build_bloom
    from ..util import dataset_arrow_schema, shard_codes, stable_hash64

    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"hash_join: how must be 'inner', 'left', 'right' or 'full', got {how!r}"
        )
    rkey = right_on or on
    lschema = dataset_arrow_schema(left)
    rschema = dataset_arrow_schema(right)
    if lschema is None or rschema is None:
        raise ValueError("hash_join: a side has no schema (empty dataset)")
    lnames = list(lschema.names)
    if on not in lnames:
        raise KeyError(f"hash_join: left key {on!r} not in {lnames}")
    if rkey not in rschema.names:
        raise KeyError(f"hash_join: right key {rkey!r} not in {list(rschema.names)}")
    # Harmonize the bucket-hash dtype across sides: a pandas-promoted
    # float64 key must land in the same bucket as its int64 counterpart
    # (ints ≤ 2^53 are exact in float64; larger keys must arrive as int64
    # or string on BOTH sides).
    ltype, rtype = lschema.field(on).type, rschema.field(rkey).type
    if pa.types.is_floating(ltype) or pa.types.is_floating(rtype):
        hash_cast: Optional[pa.DataType] = pa.float64()
    elif pa.types.is_integer(ltype) and pa.types.is_integer(rtype):
        hash_cast = pa.int64()
    else:
        hash_cast = None  # same-family types (e.g. string/string)
    if bloom_prefilter is not None:
        import numpy as np

        if bloom_prefilter not in ("left", "right", "both"):
            raise ValueError(
                "hash_join: bloom_prefilter must be 'left', 'right' or 'both', "
                f"got {bloom_prefilter!r}"
            )
        want = ("left", "right") if bloom_prefilter == "both" else (bloom_prefilter,)
        allowed = {"left": ("inner", "right"), "right": ("inner", "left")}
        for side in want:
            if how not in allowed[side]:
                raise ValueError(
                    f"hash_join: bloom_prefilter={side!r} would drop retained "
                    f"{side}-side rows under how={how!r}"
                )

        def _key_proj(ds_, keycol):
            def f(t: pa.Table) -> pa.Table:
                key = t.column(keycol)
                hk = key.cast(hash_cast) if hash_cast is not None else key
                return pa.table({"__k": hk})

            return ds_.map_batches(f, batch_format="pyarrow")

        class _KeepMaybeMatching:
            """Drop rows whose key is provably absent from the other side
            (Bloom has no false negatives → join output is unchanged)."""

            def __init__(self, ref, keycol):
                self.ref = ref
                self.keycol = keycol
                self._bm = None

            def __call__(self, t: pa.Table) -> pa.Table:
                if self._bm is None:
                    obj = self.ref
                    self._bm = obj if isinstance(obj, np.ndarray) else ray.get(obj)
                if len(t) == 0:
                    return t
                key = t.column(self.keycol)
                hk = key.cast(hash_cast) if hash_cast is not None else key
                h = stable_hash64(hk)
                maybe = _test_bits(
                    self._bm, _probe_positions(h, bloom_m_bits, 4)
                )
                return t.filter(pa.array(maybe))

        if "left" in want:
            bm = build_bloom(_key_proj(right, rkey), "__k", m_bits=bloom_m_bits)
            left = left.map_batches(
                _KeepMaybeMatching(ray.put(bm), on), batch_format="pyarrow"
            )
        if "right" in want:
            bm = build_bloom(_key_proj(left, on), "__k", m_bits=bloom_m_bits)
            right = right.map_batches(
                _KeepMaybeMatching(ray.put(bm), rkey), batch_format="pyarrow"
            )

    rout = []  # (source_name, out_name) for non-key right columns
    for nm in rschema.names:
        if nm == rkey:
            continue
        rout.append((nm, nm + suffix if nm in lnames else nm))
    combined = (
        [("__bucket", pa.int64()), ("__slot", pa.int32()), ("__rkey", rschema.field(rkey).type)]
        + [(nm, lschema.field(nm).type) for nm in lnames]
        + [(out, rschema.field(src).type) for src, out in rout]
    )

    salt_list = list(salt_keys) if salt_keys is not None else []
    if salt_list:
        import numpy as np

        if salt_factor < 2:
            raise ValueError(
                f"hash_join: salt_factor must be ≥ 2, got {salt_factor}"
            )
        if how not in ("inner", "left"):
            raise ValueError(
                "hash_join: salt_keys requires how ∈ {'inner', 'left'} — a "
                f"replicated unmatched right row would be retained under {how!r}"
            )

    def _hot_mask(hk):
        hot = pa.array(salt_list).cast(hk.type)
        return pc.fill_null(pc.is_in(hk, value_set=hot), False).to_numpy(
            zero_copy_only=False
        )

    def _buckets(hk, salt=None):
        h = stable_hash64(hk)
        if salt is not None:
            h = h + salt.astype("uint64")
        import numpy as _np

        return pa.array((h % _np.uint64(n_buckets)).astype(_np.int64))

    def left_side(t: pa.Table) -> pa.Table:
        import numpy as np

        key = t.column(on)
        # null keys never match; drop them unless this side is retained
        if how in ("inner", "right") and key.null_count:
            t = t.filter(pc.is_valid(key))
            key = t.column(on)
        n = len(t)
        hk = key.cast(hash_cast) if hash_cast is not None else key
        salt = None
        if salt_list and n:
            salt = np.zeros(n, dtype=np.int64)
            idx = np.flatnonzero(_hot_mask(hk))
            salt[idx] = np.arange(idx.size) % salt_factor  # even spread
        cols = {
            "__bucket": _buckets(hk, salt),
            "__slot": pa.repeat(pa.scalar(0, pa.int32()), n),
            "__rkey": _filler_array(rschema.field(rkey).type, n),
        }
        for nm in lnames:
            cols[nm] = t.column(nm)
        for src, out in rout:
            cols[out] = _filler_array(rschema.field(src).type, n)
        return pa.table(cols)

    def right_side(t: pa.Table) -> pa.Table:
        import numpy as np

        key = t.column(rkey)
        if how in ("inner", "left") and key.null_count:  # null keys never match
            t = t.filter(pc.is_valid(key))
            key = t.column(rkey)
        salt = None
        if salt_list and len(t):
            hk0 = key.cast(hash_cast) if hash_cast is not None else key
            hot_idx = np.flatnonzero(_hot_mask(hk0))
            if hot_idx.size:
                # replicate each hot row once per extra salt so every
                # (key, salt) bucket sees the full right side of that key
                sel = np.r_[
                    np.arange(len(t), dtype=np.int64),
                    np.tile(hot_idx, salt_factor - 1),
                ]
                salt = np.r_[
                    np.zeros(len(t), dtype=np.int64),
                    np.repeat(
                        np.arange(1, salt_factor, dtype=np.int64), hot_idx.size
                    ),
                ]
                t = t.take(pa.array(sel, pa.int64()))
                key = t.column(rkey)
        n = len(t)
        hk = key.cast(hash_cast) if hash_cast is not None else key
        cols = {
            "__bucket": _buckets(hk, salt),
            "__slot": pa.repeat(pa.scalar(1, pa.int32()), n),
            "__rkey": key,
        }
        for nm in lnames:
            cols[nm] = _filler_array(lschema.field(nm).type, n)
        for src, out in rout:
            cols[out] = t.column(src)
        return pa.table(cols)

    out_names = lnames + [out for _, out in rout]

    pd_how = {"full": "outer"}.get(how, how)

    def bucket_merge(g):
        import pandas as pd

        l = g[g["__slot"] == 0][lnames]
        r = g[g["__slot"] == 1][["__rkey"] + [out for _, out in rout]]
        # Split null-key rows out of the merge: pandas pairs NaN with NaN,
        # SQL never matches nulls.  The retained sides' null-key rows are
        # re-appended unmatched below (only the retaining sides can still
        # carry them — the map stages dropped the rest).
        l_na = l[on].isna()
        r_na = r["__rkey"].isna()
        parts = [
            l[~l_na].merge(r[~r_na], left_on=on, right_on="__rkey", how=pd_how)
        ]
        if l_na.any():
            parts.append(l[l_na])
        if r_na.any():
            parts.append(r[r_na])
        merged = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True, sort=False
        )
        if how in ("right", "full"):
            # SQL USING: coalesce the key across sides so right-only rows
            # keep their key value
            merged[on] = merged[on].where(merged[on].notna(), merged["__rkey"])
        return merged[out_names]

    unioned = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow")
    )
    return unioned.groupby("__bucket").map_groups(
        lambda g: bucket_merge(g), batch_format="pandas"
    )


def detect_hot_keys(ds, col: str, n_buckets: int = 64, factor: float = 4.0,
                    k: int = 64):
    """Skew-key candidates for ``hash_join(salt_keys=...)``: the values
    whose estimated frequency (count-min heavy hitters — never an
    undercount, so no hot key is missed) exceeds ``factor ×`` the even
    per-bucket share ``N / n_buckets``.  Diagnostic helper: costs one
    sketch pass + one count of ``ds``; run it once on a sample or a prior
    snapshot and reuse the list."""
    from ..pipelines.cms import heavy_hitters

    hh = heavy_hitters(ds, col, k)
    total = ds.count()
    threshold = factor * total / max(n_buckets, 1)
    return [
        v
        for v, e in zip(
            hh.column(col).to_pylist(), hh.column("est_count").to_pylist()
        )
        if e >= threshold
    ]
