"""Vectorized JSON field extraction over a string column — the schema-on-read
ETL step event logs need (the ``events.props`` column is a JSON object per
row).  The reference has no semi-structured surface; this is the Ray-native
equivalent of SQL ``json_extract_string(col, '$.key')``.

Primary path: polars ``str.json_path_match`` (vectorized Rust, zero Python
per row; null for a missing key or invalid JSON — matching DuckDB's
``json_extract_string`` null semantics).  Fallback when polars is absent: an
RE2 ``pc.extract_regex`` for top-level scalar fields (numbers, bare strings)
— documented as a subset, good enough for flat telemetry payloads.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

try:
    import polars as pl

    _HAS_POLARS = True
except Exception:  # pragma: no cover
    _HAS_POLARS = False


def _extract_array(col: pa.ChunkedArray, key: str) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _HAS_POLARS:
        s = pl.from_arrow(col)
        out = s.str.json_path_match(f"$.{key}").to_arrow()
        return out.cast(pa.string()) if out.type != pa.string() else out
    # RE2 fallback: top-level scalar values only (number / quoted string)
    pat = rf'"{key}"\s*:\s*(?P<v>"(?:[^"\\]|\\.)*"|-?[0-9.eE+]+|true|false|null)'
    ext = pc.extract_regex(col, pattern=pat)
    raw = pc.struct_field(ext, "v")
    unquoted = pc.utf8_trim(raw, '"')
    return pc.if_else(pc.is_valid(ext), unquoted, pa.nulls(len(col), pa.string()))


def json_field(ds, col: str, key: str, out_col: Optional[str] = None,
               arrow_type: Optional[pa.DataType] = None):
    """Append top-level JSON field ``key`` of string column ``col`` as
    ``out_col`` (default: the key name).  ``arrow_type``: optional cast of
    the extracted string (e.g. ``pa.int64()``); values that don't parse
    become null, like SQL ``TRY_CAST``.  Embarrassingly parallel
    ``map_batches`` — no shuffle at any scale."""
    name = out_col or key

    def stamp(t: pa.Table) -> pa.Table:
        vals = _extract_array(t.column(col), key)
        if arrow_type is not None:
            try:
                vals = vals.cast(arrow_type)
            except pa.ArrowInvalid:
                # per-value TRY_CAST: null out the unparsable ones
                import numpy as np

                ok = np.zeros(len(vals), dtype=bool)
                pyvals = vals.to_pylist()
                cast_vals = []
                for i, v in enumerate(pyvals):
                    try:
                        cast_vals.append(
                            pa.scalar(v, pa.string()).cast(arrow_type).as_py()
                            if v is not None else None
                        )
                        ok[i] = True
                    except (pa.ArrowInvalid, ValueError):
                        cast_vals.append(None)
                vals = pa.array(cast_vals, arrow_type)
        return t.append_column(name, vals)

    return ds.map_batches(stamp, batch_format="pyarrow")
