"""Vectorized regex field extraction over a string column — the generic
cousin of ``jsonx.json_field`` for non-JSON telemetry (log lines, URLs,
user agents).  The reference has no extraction surface (its PatternMatch
analyzer only COUNTS matches, ``hooqu/analyzers/pattern_match.py``); at
scale "parse a field out of every line" is a core map-only ETL step.

Semantics are pinned to DuckDB ``regexp_extract(col, pattern, group)``
(both sides are RE2, bit-for-bit on the same pattern string — CLAUDE.md):
no match → ``''`` (empty string, NOT null), null input → null.
"""

from __future__ import annotations

import re
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

_NAMED_GROUP_RE = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


def regex_extract(ds, col: str, pattern: str,
                  out_col: Optional[str] = None):
    """Append the text captured by ``pattern``'s single NAMED group
    (``(?P<name>...)``) from string column ``col`` as ``out_col``
    (default: the group name).  DuckDB ``regexp_extract`` parity: rows
    that don't match get ``''``; null inputs stay null.

    The pattern must be RE2-compatible (Arrow's engine; probed at build
    time on a NON-empty array — an empty probe never compiles the
    pattern) and contain exactly one named group.  Map-only: no shuffle
    at any scale; the compiled pattern lives in the Arrow kernel, zero
    Python per row."""
    names = _NAMED_GROUP_RE.findall(pattern)
    if len(names) != 1:
        raise ValueError(
            "regex_extract needs exactly ONE named group (?P<name>...) "
            f"in the pattern, found {len(names)}: {pattern!r}")
    gname = names[0]
    try:  # Arrow's extract_regex rejects UNNAMED capture groups
        rx = re.compile(pattern)
        if rx.groups > len(rx.groupindex):
            raise ValueError(
                "regex_extract: Arrow's extract_regex supports NAMED "
                "groups only — make extra groups non-capturing (?:...) "
                f"or named: {pattern!r}")
    except re.error:
        pass  # RE2-only syntax; the probe below is authoritative
    try:  # RE2 probe (non-empty array — CLAUDE.md gotcha)
        pc.extract_regex(pa.array(["probe"]), pattern=pattern)
    except pa.ArrowInvalid as ex:
        raise ValueError(
            f"pattern is not RE2-compatible: {pattern!r} ({ex})") from ex
    name = out_col or gname

    def stamp(t: pa.Table) -> pa.Table:
        if name in t.column_names:
            raise ValueError(
                f"regex_extract output column {name!r} already exists — "
                "pass out_col to rename")
        src = t.column(col)
        ext = pc.extract_regex(pc.fill_null(src, ""), pattern=pattern)
        vals = pc.fill_null(pc.struct_field(ext, gname), "")
        vals = pc.if_else(pc.is_valid(src), vals,
                          pa.scalar(None, pa.string()))
        return t.append_column(name, vals)

    return ds.map_batches(stamp, batch_format="pyarrow")
