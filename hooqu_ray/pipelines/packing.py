"""Sequence PACKING writer: concatenate whitespace-tokenized documents in
deterministic id order into one global token stream and emit fixed-length
training sequences — the materialization step whose PLAN table
:func:`~hooqu_ray.pipelines.relational.pack_sequences` computes (that one
moves only token counts; this one actually builds the packed text).

Shape:

1. ONE range ``sort(id)`` of the (id, text) projection.  This is the
   packer's inherent all-to-all — output sequences interleave document
   boundaries, so the text must be brought into global order exactly once
   (a corpus already id-partitioned on disk skips it).
2. A summary pass reduces each block to ``(first_id, Σtokens)``; the driver
   prefix-sums #blocks rows and broadcasts the offset table (the
   ``global_row_number`` discipline — nothing else leaves the cluster).
3. A fragment pass re-tokenizes each block (vectorized RE2 split, empties
   filtered), assigns every token its GLOBAL index (block offset + local
   arange), cuts at ``seq = index // max_len`` boundaries and joins each
   in-block run with one ``binary_join`` — zero Python per token.  Interior
   sequences are final; only each block's FIRST and LAST sequence can
   straddle a block edge and go through a ≤ 2-groups-per-block
   ``groupby(seq_id)`` repair (the sessionization pattern).

Null/empty documents contribute no tokens.  Every sequence except the last
has exactly ``max_len`` tokens; token order is the document order used by
the plan table, so plan and writer agree row for row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_SPLIT = r"\s+"


def _block_tokens(t: pa.Table, text_col: str) -> pa.Array:
    """Flat array of the block's non-empty whitespace tokens, in document
    order (documents are id-sorted within the block after the range sort)."""
    texts = t.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=_WS_SPLIT)
    flat = lists.flatten()
    return flat.filter(pc.not_equal(flat, ""))


def _frag_empty() -> pa.Table:
    return pa.table(
        {
            "seq_id": pa.array([], pa.int64()),
            "frag_start": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "__pending": pa.array([], pa.bool_()),
        }
    )


def _fragments_block(t: pa.Table, text_col: str, max_len: int,
                     offsets: dict, id_col: str) -> pa.Table:
    if len(t) == 0:
        return _frag_empty()
    flat = _block_tokens(t, text_col)
    n = len(flat)
    if n == 0:
        return _frag_empty()
    base = offsets[t.column(id_col)[0].as_py()]
    gidx = base + np.arange(n, dtype=np.int64)
    seq = gidx // max_len
    starts = np.flatnonzero(np.r_[True, seq[1:] != seq[:-1]])
    ends = np.r_[starts[1:], n]
    off = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum((ends - starts).astype(np.int32), out=off[1:])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(off, pa.int32()),
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
        ),
        " ",
    )
    seq_ids = seq[starts]
    pending = (seq_ids == seq_ids[0]) | (seq_ids == seq_ids[-1])
    return pa.table(
        {
            "seq_id": pa.array(seq_ids, pa.int64()),
            "frag_start": pa.array(gidx[starts], pa.int64()),
            "n_tokens": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "text": joined,
            "__pending": pa.array(pending, pa.bool_()),
        }
    )


class _MergeBoundarySeq:
    """groupby(seq_id) repair: order one straddling sequence's fragments by
    global token start and join them — the group holds every fragment of
    that sequence (each touches a block edge)."""

    def __call__(self, g: pa.Table) -> pa.Table:
        g = g.sort_by([("frag_start", "ascending")])
        txt = g.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array([0, len(g)], pa.int32()), txt
        )
        return pa.table(
            {
                "seq_id": g.column("seq_id").slice(0, 1),
                "n_tokens": pa.array(
                    [pc.sum(g.column("n_tokens")).as_py() or 0], pa.int64()
                ),
                "text": pc.binary_join(lists, " "),
            }
        )


def pack_texts(ds, id_col: str, text_col: str, max_len: int):
    """Materialize packed training sequences of exactly ``max_len``
    whitespace tokens (last one may be shorter): returns a Dataset of
    ``(seq_id, n_tokens, text)``.  See the module docstring for the shape;
    ``id_col`` must be unique and non-null."""
    from ..util import collect_arrow

    if max_len < 1:
        raise ValueError(f"pack_texts: max_len must be ≥ 1, got {max_len}")

    proj = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    sorted_ds = proj.sort(id_col).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or len(t) == 0:
            return pa.table({"__fid": pa.array([]), "__tok": pa.array([], pa.int64())})
        return pa.table(
            {
                "__fid": t.column(id_col).slice(0, 1),
                "__tok": pa.array([len(_block_tokens(t, text_col))], pa.int64()),
            }
        )

    summ = collect_arrow(
        sorted_ds.map_batches(summary, batch_format="pyarrow", batch_size=None)
    )
    if summ is None or len(summ) == 0:
        return sorted_ds.map_batches(lambda t: _frag_empty().drop_columns(
            ["frag_start", "__pending"]), batch_format="pyarrow")
    summ = summ.sort_by([("__fid", "ascending")])
    toks = summ.column("__tok").to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(toks)[:-1]]).astype(np.int64)
    offsets = {
        fid: int(off) for fid, off in zip(summ.column("__fid").to_pylist(), offs)
    }

    frags = sorted_ds.map_batches(
        lambda t: _fragments_block(t, text_col, max_len, offsets, id_col),
        batch_format="pyarrow", batch_size=None,
    ).materialize()  # consumed by the interior and boundary passes below

    out_cols = ["seq_id", "n_tokens", "text"]
    interior = frags.map_batches(
        lambda t, _c=out_cols: t.filter(
            pc.invert(t.column("__pending"))
        ).select(_c),
        batch_format="pyarrow",
    )
    boundary = frags.map_batches(
        lambda t, _c=["seq_id", "frag_start", "n_tokens", "text"]: t.filter(
            t.column("__pending")
        ).select(_c),
        batch_format="pyarrow",
    )
    merge = _MergeBoundarySeq()
    merged = boundary.groupby("seq_id").map_groups(
        lambda g, _m=merge: _m(g), batch_format="pyarrow"
    )
    return interior.union(merged)


def length_bucket_batches(ds, id_col: str, text_col: str,
                          boundaries, batch_size: int):
    """Length-bucketed BATCHING plan: assign every document a length
    bucket (token count vs sorted ``boundaries``, ``searchsorted`` right —
    bucket i holds ``boundaries[i-1] <= n < boundaries[i]``) and a batch
    index within its bucket in deterministic ``id_col`` order —
    ``row_number() OVER (PARTITION BY bucket ORDER BY id) // batch_size``.
    Batching same-length documents together is the standard padding-
    efficiency lever for training/inference (a batch's pad waste is
    bounded by its bucket width instead of the corpus max length).

    Composition of existing scale-shaped stages: a vectorized token-count
    + bucket pass (RE2 ``count_substring_regex``, ``np.searchsorted``),
    then :func:`~hooqu_ray.pipelines.windows.running_agg` for the
    per-bucket running row number (ONE range sort + boundary merge that
    touches ≤ 2 buckets per block — never a per-group shuffle).  Returns
    ``(id, n_tokens, bucket, batch_idx)``; deterministic across runs and
    data orderings."""
    from .textstats import TOKEN_PATTERN
    from .windows import running_agg

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    bounds = np.asarray(sorted(boundaries), dtype=np.int64)

    def bucketize(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        n_tok = pc.fill_null(
            pc.count_substring_regex(text, pattern=TOKEN_PATTERN), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.searchsorted(bounds, n_tok, side="right")
        return pa.table({
            id_col: t.column(id_col),
            "__tie": t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "bucket": pa.array(bucket.astype(np.int64)),
        })

    run = running_agg(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        key="bucket", ts_col=id_col, tie="__tie", value_col="n_tokens",
    )

    def finish(t: pa.Table) -> pa.Table:
        # running_agg returns [key, ts, tie, run_sum, run_n]; the per-row
        # token count is not carried through — the plan is (id, bucket,
        # batch_idx), re-derive n_tokens downstream if needed
        if "run_n" not in t.column_names:  # schema-less empty block
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "batch_idx": pa.array([], pa.int64())})
        rn = pc.cast(t.column("run_n"), pa.int64())
        # integer (rn - 1) // batch_size without a float round trip
        batch_idx = pc.cast(
            pc.divide(pc.subtract(rn, 1), pa.scalar(batch_size, pa.int64())),
            pa.int64())
        return pa.table({
            id_col: t.column(id_col),
            "bucket": pc.cast(t.column("bucket"), pa.int64()),
            "batch_idx": batch_idx,
        })

    return run.map_batches(finish, batch_format="pyarrow")
