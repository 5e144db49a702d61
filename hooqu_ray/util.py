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


class BroadcastIsInFilter:
    """``map_batches`` stage: keep rows whose ``col`` value is in a broadcast
    Arrow value set (``invert=True`` keeps the complement — an anti-join).
    The set ships ONCE via ``ray.put`` (zero-copy plasma read per worker,
    not re-serialized per task) and ``pc.is_in`` is a C hash probe — no
    Python per row."""

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
        mask = pc.is_in(t.column(self.col), value_set=self._values)
        if self.invert:
            mask = pc.invert(mask)
        return t.filter(mask)


def actor_pool_size(cap: Optional[int] = None, headroom: int = 2) -> int:
    """Fixed actor-pool size for a map_batches stage: cluster CPUs minus
    ``headroom`` (the upstream read / sibling task stages need slots — a
    pool that pins EVERY logical CPU deadlocks the streaming executor),
    optionally capped.  Falls back to 2 off-cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover
        cpus = 4
    size = max(2, cpus - headroom)
    if cap is not None:
        size = min(size, cap)
    return size
