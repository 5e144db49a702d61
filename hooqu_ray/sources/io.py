"""Sources & sinks.

The reference has none (data arrives as an in-memory frame,
``verification_suite.py:113-114``); at scale, reads/writes ARE the pipeline
boundary, so these helpers encode the non-negotiables:

- **prune at the read**: always pass ``columns=`` and (where possible) a
  pyarrow dataset ``filter=`` so only needed columns/row groups leave
  storage;
- **resumable output**: partitioned directories with atomic commit markers
  (see ``state.checkpoint`` for the full protocol);
- **bounded files**: ``min_rows_per_file`` so outputs are neither one giant
  file nor a million tiny ones.
"""

from __future__ import annotations

from typing import Optional, Sequence


def read_table(path: str, columns: Optional[Sequence[str]] = None, filter_expr=None):
    """``ray.data.read_parquet`` with column pruning + row-group pushdown."""
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return rd.read_parquet(path, **kwargs)


def read_jsonl(path: str):
    import ray.data as rd

    return rd.read_json(path)


def read_text(path: str):
    import ray.data as rd

    return rd.read_text(path)


def read_binary(path: str, include_paths: bool = True):
    """Opaque payloads (images/audio/video) with their source path."""
    import ray.data as rd

    return rd.read_binary_files(path, include_paths=include_paths)


def write_partitioned(ds, out_dir: str, min_rows_per_file: int = 200_000):
    """Streaming parquet write, bounded file sizes."""
    try:
        ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir, num_rows_per_file=min_rows_per_file)
    return out_dir


def write_jsonl(ds, out_dir: str, min_rows_per_file: int = 200_000):
    """Streaming JSONL write (one JSON object per line, the interchange
    format most text-corpus tooling speaks), bounded file sizes like
    :func:`write_partitioned`.  Returns ``out_dir``; read back with
    :func:`read_jsonl`."""
    try:
        ds.write_json(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_json(out_dir, num_rows_per_file=min_rows_per_file)
    return out_dir
