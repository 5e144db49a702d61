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


def read_csv(path: str, columns: Optional[Sequence[str]] = None,
             schema=None):
    """``ray.data.read_csv`` hardened for text corpora — and configured so
    the :func:`write_csv` round trip is LOSSLESS: ``newlines_in_values``
    accepts embedded newlines in quoted fields; ``strings_can_be_null`` +
    ``quoted_strings_can_be_null=False`` map the writer's unquoted empty
    field back to null while a quoted ``""`` stays the empty string;
    ``null_values=[""]`` keeps float ``nan`` text as NaN (CSV default
    null-word lists would fold it into null); ``ignore_empty_lines=False``
    keeps single-column null rows (they render as blank lines).

    Pass ``schema`` (a ``pyarrow.Schema``) whenever the column types are
    known — CSV type INFERENCE re-types numeric-looking strings
    (``"00456"`` → int64 456), locks types from the first block of the
    streaming reader (later non-conforming values raise mid-read), and
    infers Arrow ``null`` for all-null columns (mixed per-file schemas).
    ``columns`` prunes at the parse (include_columns), not after."""
    import pyarrow.csv as pcsv
    import ray.data as rd

    convert = pcsv.ConvertOptions(
        strings_can_be_null=True, quoted_strings_can_be_null=False,
        null_values=[""],
        column_types=(dict(zip(schema.names, schema.types))
                      if schema is not None else None),
        include_columns=list(columns) if columns is not None else None)
    return rd.read_csv(
        path,
        parse_options=pcsv.ParseOptions(newlines_in_values=True,
                                        ignore_empty_lines=False),
        convert_options=convert)


def write_csv(ds, out_dir: str, min_rows_per_file: int = 200_000):
    """Streaming CSV write (Arrow quoting: fields quoted when needed, so
    commas/quotes/newlines survive; nulls become unquoted empty fields —
    see :func:`read_csv` for the lossless read-back).  Bounded file sizes
    like :func:`write_partitioned`."""
    try:
        ds.write_csv(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_csv(out_dir, num_rows_per_file=min_rows_per_file)
    return out_dir
