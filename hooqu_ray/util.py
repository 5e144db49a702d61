"""Small shared utilities."""

from __future__ import annotations

from typing import Optional


def dataset_arrow_schema(ds) -> "Optional[object]":
    """Arrow schema of a ray.data.Dataset, normalized across block types.

    Handles: plain pa.Schema, ray.data.Schema wrapping an Arrow base schema,
    and PandasBlockSchema (numpy dtypes; object dtype → pa.string(), matching
    the per-block pandas→Arrow conversion).  Returns None for a dataset with
    no blocks at all."""
    import numpy as np
    import pyarrow as pa

    schema = ds.schema()
    if schema is None:
        return None
    if isinstance(schema, pa.Schema):
        return schema
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(schema.names, schema.types):
        if not isinstance(typ, pa.DataType):
            np_typ = typ if isinstance(typ, np.dtype) else np.dtype(typ)
            typ = pa.string() if np_typ.kind == "O" else pa.from_numpy_dtype(np_typ)
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


# Below this many values a direct pc.is_in hash-set build per call is
# cheaper than the inverted probe.
_DIRECT_ISIN_MAX = 65_536


def isin_mask(col, values, direct_max: int = _DIRECT_ISIN_MAX):
    """Membership mask of ``col`` against a (possibly huge) ``values`` array.

    ``pc.is_in`` rebuilds a hash set of its value_set on EVERY call, so
    probing batches directly against a multi-million-entry set pays a full
    set build per block (measured on the flagship verdict pass: 12s → 84s
    at 25M rows / 1.6M keys).  Above ``direct_max`` the test is INVERTED:
    hash the column's few unique values (cheap build), stream the big set
    through it once, then probe against the tiny intersection."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(values) <= direct_max:
        return pc.is_in(col, value_set=values)
    uniq = pc.unique(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    present = values.filter(pc.is_in(values, value_set=uniq))
    return pc.is_in(col, value_set=present)


class BroadcastIsInFilter:
    """``map_batches`` stage: keep rows whose ``col`` value is in a broadcast
    Arrow value set (``invert=True`` keeps the complement — an anti-join;
    null keys are dropped either way, matching SQL ``IN`` / ``NOT IN``
    three-valued semantics).  The set ships ONCE via ``ray.put`` (zero-copy
    plasma read per worker, not re-serialized per task) and the membership
    probe is ``isin_mask`` — vectorized C, with the inverted-probe path for
    large sets."""

    def __init__(self, values_ref, col: str, invert: bool = False):
        self.values_ref = values_ref
        self.col = col
        self.invert = invert
        self._values = None

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        if self._values is None:
            import ray

            obj = self.values_ref
            self._values = obj if isinstance(obj, pa.Array) else ray.get(obj)
        col = t.column(self.col)
        mask = isin_mask(col, self._values)
        if self.invert:
            # NOT IN: a null key is neither in nor not-in — drop it
            mask = pc.and_(pc.invert(mask), pc.is_valid(col))
        return t.filter(mask)


def collect_arrow(ds):
    """Materialize a (small) dataset as one local Arrow table, skipping the
    schema-less empty blocks Ray's aggregate can emit.  Returns None when
    nothing survives.  ``to_arrow_refs`` can hand back RAW pandas blocks
    (e.g. empty sort partitions skip the pyarrow conversion) — convert
    them here instead of crashing on ``.num_columns``."""
    import pandas as pd
    import pyarrow as pa
    import ray

    parts = []
    for t in ray.get(ds.to_arrow_refs()):
        if isinstance(t, pd.DataFrame):
            if len(t) == 0 or len(t.columns) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns and len(t):
            parts.append(t)
    return pa.concat_tables(parts).combine_chunks() if parts else None


# splitmix64 finalizer constants — deterministic across processes (builtin
# hash() is PYTHONHASHSEED-random per Ray worker and must never shard keys)
_MIX_C1 = 0xBF58476D1CE4E5B9
_MIX_C2 = 0x94D049BB133111EB


def stable_hash64(col):
    """Deterministic uint64 hash per value of an Arrow array/column —
    identical on every worker and across runs.

    Integer columns go through a splitmix64 finalizer (the raw value
    would alias with any modulo already used upstream, e.g. LSH bucket keys);
    string columns hash via polars (process-stable for a fixed seed).  Nulls
    hash deterministically like the type's zero value."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_integer(col.type):
        x = (
            pc.fill_null(col, 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
    elif pa.types.is_floating(col.type):
        # hash the float64 bit pattern; normalize -0.0 → 0.0 so equal keys
        # hash equal.  Callers joining a float column against an int column
        # must cast BOTH sides to float64 first (hash_join does).
        v = (
            pc.fill_null(col, 0.0)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
            .copy()
        )
        v[v == 0.0] = 0.0
        x = v.view(np.uint64)
    else:
        try:
            import polars as pl

            x = pl.from_arrow(pc.fill_null(col, "")).hash(seed=0).to_numpy().astype(np.uint64)
        except ImportError:  # pragma: no cover - process-stable slow path
            import hashlib

            x = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                        "little",
                    )
                    for v in col.to_pylist()
                ),
                dtype=np.uint64,
                count=len(col),
            )
    return splitmix64(x)


def splitmix64(x):
    """splitmix64 finalizer over a uint64 numpy array — the ONE shared
    mixing tail (``stable_hash64``, conversation fingerprints); change it
    in one place or cross-run hashes silently diverge."""
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(_MIX_C1)
    x ^= x >> np.uint64(27)
    x *= np.uint64(_MIX_C2)
    x ^= x >> np.uint64(31)
    return x


def shard_codes(col, n_shards: int):
    """Deterministic shard id in ``[0, n_shards)`` per value of an Arrow
    array/column (``stable_hash64 % n_shards``) — identical on every worker
    and across runs.  Nulls land deterministically in one shard."""
    import numpy as np

    return (stable_hash64(col) % np.uint64(n_shards)).astype(np.int64)


class ShardFilter:
    """``map_batches`` stage: keep only rows whose ``col`` value falls in hash
    shard ``shard`` of ``n_shards`` (``shard_codes`` partitioning).  The loop
    "collect → broadcast → filter one key-range shard at a time" is the
    standard fix for any candidate/winner set that would otherwise
    materialize unbounded on the driver."""

    def __init__(self, col: str, n_shards: int, shard: int):
        self.col = col
        self.n_shards = n_shards
        self.shard = shard

    def __call__(self, t):
        import pyarrow as pa

        if len(t) == 0:
            return t
        mask = shard_codes(t.column(self.col), self.n_shards) == self.shard
        return t.filter(pa.array(mask))


def embedding_matrix(col, dtype=None):
    """(n, dim) numpy matrix from an Arrow ``list<float>`` /
    ``fixed_size_list<float>`` column WITHOUT the per-row Python of
    ``np.stack(col.to_pylist())``: flatten the child values buffer and
    reshape.  Falls back to the list path for ragged lists or lists with
    null entries (misaligned flatten).  ``dtype=None`` keeps the storage
    dtype; pass ``np.float64`` for matmul-precision work."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
            flat = col.flatten()  # offset/slice-aware
            if flat.null_count == 0:
                m = flat.to_numpy(zero_copy_only=False).reshape(n, dim)
                return m.astype(dtype, copy=False) if dtype is not None else m
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            if lens.size and (lens == lens[0]).all() and lens[0] > 0:
                flat = pc.list_flatten(col)
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                if flat.null_count == 0:
                    m = flat.to_numpy(zero_copy_only=False).reshape(n, int(lens[0]))
                    return (
                        m.astype(dtype, copy=False) if dtype is not None else m
                    )
    return np.stack(col.to_pylist()).astype(dtype or np.float64)


def actor_pool_size(cap: Optional[int] = None, headroom: int = 2) -> int:
    """Fixed actor-pool size for a map_batches stage: cluster CPUs minus
    ``headroom`` (the upstream read / sibling task stages need slots — a
    pool that pins EVERY logical CPU deadlocks the streaming executor),
    optionally capped.  Falls back to 2 off-cluster.

    NEVER returns more than cpus − 1: the old ``max(2, cpus − 2)`` floor
    meant a 2-CPU cluster got a 2-actor pool claiming every slot, and the
    fused upstream read starved forever (measured: a 2-CPU scaling leg hung
    86 minutes).  Clusters need ≥ 2 CPUs for actor-pool stages at all."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover
        cpus = 4
    size = max(1, min(cpus - headroom, cpus - 1))
    if cap is not None:
        size = min(size, cap)
    return size


def tree_reduce(rows, combine, fanout: int = 64):
    """Distributed TREE reduction of a (materialized) dataset of partial
    rows: while more than ``fanout`` rows remain, each task combines up to
    ``fanout`` of them into one (``combine``: pa.Table -> 1-row pa.Table);
    the final ≤ fanout rows return as ONE local Arrow table (via a last
    local ``combine``), or None for an empty input.  The driver never
    sees more than ``fanout`` partial rows — the reduction shape shared
    by the Bloom bitmap OR-merge and k-means partial-sum ADD."""
    rows = rows.materialize()
    while rows.count() > fanout:
        rows = rows.map_batches(
            combine, batch_format="pyarrow", batch_size=fanout
        ).materialize()
    tbl = collect_arrow(rows)
    if tbl is None or len(tbl) == 0:
        return None
    return combine(tbl)


def sharded_value_refs(ds, col: str, rows_per_shard: int = 4_000_000):
    """Collect ONE column of a slim dataset to the driver in key-hash-range
    shards and ``ray.put`` each shard's Arrow array — the value-set variant
    of the winner-table sharding (``pipelines/dedup._sharded_refs``).
    Consumers chain one ``BroadcastIsInFilter`` per shard: a value lives in
    exactly one shard, so chained keep-masks AND to the unsharded
    semantics.  Returns a possibly-empty list of object refs."""
    import pyarrow as pa
    import ray

    ds = ds.materialize()
    n = ds.count()

    def _arr(d):
        tbl = collect_arrow(d)
        if tbl is None or len(tbl) == 0:
            return None
        return tbl.column(col).combine_chunks()

    if n <= rows_per_shard:
        a = _arr(ds)
        return [ray.put(a)] if a is not None else []
    n_shards = -(-n // rows_per_shard)
    refs = []
    for s in range(n_shards):
        a = _arr(ds.map_batches(ShardFilter(col, n_shards, s), batch_format="pyarrow"))
        if a is not None:
            refs.append(ray.put(a))
    return refs


def global_stream_offsets(sorted_ds, id_col: str, token_cols):
    """Global exclusive token offset per block of an ``id_col``-sorted
    dataset — the shared mechanics behind the packing planners
    (``relational.pack_sequences``, ``transcripts.pack_sft_examples``):
    each block reduces to ``(first_id, Σ token_cols, …)``, the driver
    prefix-sums #blocks summary rows, and the returned ``{first_id:
    offset}`` dict broadcasts so each block turns its local exclusive
    cumsum into global stream positions.  Returns ``None`` when the
    dataset is empty."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def summary(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or len(t) == 0:
            return pa.table({"__fid": pa.array([]),
                             "__tok": pa.array([], pa.int64())})
        total = sum(pc.sum(t.column(c)).as_py() or 0 for c in token_cols)
        return pa.table({"__fid": t.column(id_col).slice(0, 1),
                         "__tok": pa.array([total], pa.int64())})

    summ = collect_arrow(
        sorted_ds.map_batches(summary, batch_format="pyarrow",
                              batch_size=None))
    if summ is None or len(summ) == 0:
        return None
    summ = summ.sort_by([("__fid", "ascending")])
    toks = summ.column("__tok").to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(toks)[:-1]]).astype(np.int64)
    return {fid: int(off) for fid, off in
            zip(summ.column("__fid").to_pylist(), offs)}


class _EmptyBlockSchemaWarningFilter:
    """Drops Ray 2.49's "RefBundle with a different schema" warning ONLY
    when one side of the comparison is an EMPTY block (its schema prints
    as nothing): the streaming executor derives bundle schemas from data,
    so any filter-shaped ``map_batches`` that legitimately empties a block
    trips the warning even though the declared Arrow schema is identical
    (reproduced: from_arrow([t, t.slice(0,0)]) → identity map → warning).
    A GENUINE schema-A-vs-schema-B conflict still warns."""

    _MARK = "RefBundle with a different schema"

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        if self._MARK not in msg:
            return True
        # only the NEW-side-empty variant can fire: Ray 2.49's
        # build_output_bundle returns early (no warning) when the
        # PREVIOUS schema is empty, so no "Previous schema: ," message
        # exists to match
        return "new schema: . This may lead" not in msg


def install_empty_block_schema_warning_filter() -> None:
    """Attach the empty-block false-positive filter to Ray Data's streaming
    executor logger (idempotent).  Call from benches/CLIs that require
    clean stderr; the library never mutates global logging on import."""
    import logging

    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBlockSchemaWarningFilter)
               for f in logger.filters):
        logger.addFilter(_EmptyBlockSchemaWarningFilter())
