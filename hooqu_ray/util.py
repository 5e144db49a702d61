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
    nothing survives."""
    import pyarrow as pa
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns and len(t)]
    return pa.concat_tables(parts).combine_chunks() if parts else None


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
