"""Overlapping context-window chunking: documents -> fixed-size token
windows (RAG / pretraining chunking).

Splits every document's token stream into windows of ``size`` tokens
advancing by ``stride`` (< size = overlap), emitting the window text and
its token interval. Unlike packing (pack.py), which needs a global prefix
sum, chunking is per-document: a pure ``map_batches`` stage — no shuffle,
no state, scales embarrassingly. The output inflates by ~size/stride; the
stage streams, so that inflation never concentrates anywhere.

All kernels are batch-vectorized: one Arrow regex split per batch, empty
tokens filtered by an offset re-map (no per-doc Python), window token
ranges gathered with a single grouped-arange take, window text built with
the Arrow list-join kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tokenize_flat(texts) -> tuple[pa.Array, np.ndarray]:
    """``\\w+`` tokens of a string column as (flat token array, per-doc
    int64 offsets). One RE2 split + one boolean filter; equals DuckDB's
    ``regexp_extract_all(text, '\\w+')`` on the same input."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    la = pc.split_pattern_regex(texts.cast(pa.string()), r"\W+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.values
    offsets = np.asarray(la.offsets).astype(np.int64)
    # splitting leaves '' at boundaries ("-a-" -> ['','a','']); drop them
    # and re-map the offsets with a cumulative-valid-count scan
    valid = np.asarray(pc.not_equal(flat, "").fill_null(False))
    cs = np.concatenate([[0], np.cumsum(valid)]).astype(np.int64)
    new_offsets = cs[offsets]
    flat = flat.filter(pa.array(valid))
    return flat, new_offsets


def ranges_join(values: pa.Array, begins: np.ndarray, ends: np.ndarray,
                sep: str) -> pa.Array:
    """Join ``values[begins[i]:ends[i]]`` with ``sep`` for every i —
    variable (possibly overlapping) ranges, so Arrow list offsets can't
    share the buffer: gather once with a grouped arange, then list-join."""
    lens = (ends - begins).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(offsets[-1])
    idx = np.repeat(begins, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    )
    gathered = values.take(pa.array(idx, pa.int64()))
    la = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), gathered)
    return pc.binary_join(la, sep)


def chunk_documents(
    ds,
    size: int = 256,
    stride: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
):
    """Dataset of documents -> Dataset of overlapping token windows:
    ``(id, chunk_idx, begin_tok, end_tok, n_chunk_tokens, chunk_text)``.

    Chunk i of a doc with n tokens covers ``[i*stride, min(i*stride+size,
    n))``; a doc gets ``ceil((n-size)/stride)+1`` chunks (1 if n <= size,
    0 if empty) — the last window always reaches the final token. SQL
    mirror: ``generate_series`` over that count + ``list_slice`` of
    ``regexp_extract_all``."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    extra = keep_cols or []

    def f(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                (id_col, t.schema.field(id_col).type),
                *((c, t.schema.field(c).type) for c in extra),
                ("chunk_idx", pa.int64()),
                ("begin_tok", pa.int64()),
                ("end_tok", pa.int64()),
                ("n_chunk_tokens", pa.int64()),
                ("chunk_text", pa.string()),
            ]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        flat, offsets = _tokenize_flat(t[text_col])
        n = np.diff(offsets)
        n_chunks = np.where(
            n == 0,
            0,
            np.where(n > size, (n - size + stride - 1) // stride + 1, 1),
        ).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        c_off = np.concatenate([[0], np.cumsum(n_chunks)]).astype(np.int64)
        total = int(c_off[-1])
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            c_off[:-1], n_chunks
        )
        begin = chunk_idx * stride
        end = np.minimum(begin + size, n[doc_rep])
        text = ranges_join(
            flat, offsets[:-1][doc_rep] + begin, offsets[:-1][doc_rep] + end,
            " ",
        )
        take = pa.array(doc_rep, pa.int64())
        return pa.table(
            {
                id_col: t[id_col].take(take),
                **{c: t[c].take(take) for c in extra},
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "begin_tok": pa.array(begin, pa.int64()),
                "end_tok": pa.array(end, pa.int64()),
                "n_chunk_tokens": pa.array(end - begin, pa.int64()),
                "chunk_text": text,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
