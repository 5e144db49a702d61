"""Document chunking: split documents into overlapping fixed-token-count
chunks — the sequence-prep step between corpus filtering and tokenization
(context-window packing, RAG indexing, embedding inputs).

One vectorized Arrow pass per batch, embarrassingly parallel (each document
chunks independently — no shuffle at ANY scale): tokenize with
``utf8_split_whitespace``, derive every chunk's (doc, start, length) with
numpy range arithmetic, gather the token slices with ONE ``take`` and
rebuild chunk text with ONE ``binary_join`` — no Python per chunk or per
token.  Chunk k of a document covers tokens ``[k*(size-overlap),
k*(size-overlap)+size)``; chunking continues while the start is in range,
so every token lands in ≥1 chunk and the final chunk may be short.  Exactly
reproducible in SQL (DuckDB list slicing + ``generate_series`` over the
same whitespace tokens)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_stage(t: pa.Table, text_col: str = "text", id_col: str = "doc_id",
                size: int = 256, overlap: int = 32) -> pa.Table:
    """Per-batch chunker: rows (id, chunk_idx, chunk_text, n_tokens).

    ``chunk_idx`` is 0-based per document; null/empty documents emit no
    rows.  Output row count is ~``overlap_factor × input tokens / size``
    — bounded per batch, so block sizes stay predictable."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    texts = t.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    words = pc.utf8_split_whitespace(filled)
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n = len(t)
    if len(flat):
        keep = pc.invert(pc.equal(flat, "")).to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(keep))
        tp = parent[keep]
    else:
        toks, tp = flat, parent[:0]
    id_type = t.column(id_col).type
    lengths = np.bincount(tp, minlength=n).astype(np.int64)
    n_chunks = np.where(lengths > 0, (lengths - 1) // step + 1, 0).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_col: pa.array([], id_type),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    tok_off = np.r_[0, np.cumsum(lengths)]
    doc_of = np.repeat(np.arange(n), n_chunks)
    excl = np.r_[0, np.cumsum(n_chunks)[:-1]]
    cidx = np.arange(total) - np.repeat(excl, n_chunks)
    start = cidx * step
    clen = np.minimum(size, lengths[doc_of] - start)
    base = tok_off[doc_of] + start
    coff = np.r_[0, np.cumsum(clen)]
    idx = np.arange(coff[-1]) - np.repeat(coff[:-1], clen) + np.repeat(base, clen)
    values = toks.take(pa.array(idx, pa.int64()))
    lists = pa.LargeListArray.from_arrays(pa.array(coff, pa.int64()), values)
    chunk_text = pc.cast(pc.binary_join(lists, " "), pa.string())
    return pa.table(
        {
            id_col: t.column(id_col).take(pa.array(doc_of, pa.int64())),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "chunk_text": chunk_text,
            "n_tokens": pa.array(clen, pa.int64()),
        }
    )


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = 256, overlap: int = 32):
    """Dataset wrapper for :func:`chunk_stage` — one streaming
    ``map_batches`` pass; output streams straight to a sink (rows expand
    by the overlap factor, so never materialize the result of a big
    corpus)."""
    return ds.map_batches(
        lambda t, _tc=text_col, _ic=id_col, _s=size, _o=overlap: chunk_stage(
            t, _tc, _ic, _s, _o
        ),
        batch_format="pyarrow",
    )
