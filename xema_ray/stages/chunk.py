"""Document chunking — split long documents into fixed-size windows with
overlap, the context-length preprocessing step every LLM training export
needs (reference scope: table-level transforms; this is a training-data
extension, SURVEY.md §2 "beyond the reference").

``chunk_documents`` is a pure ``map_batches`` explode: no shuffle, no
state, output rows ≈ input rows × (len/stride).  The kernel is
vectorized over chunk ORDINALS (one Arrow slice call per ordinal, ~len
/stride iterations per batch), never over rows.

Semantics (shared with the SQL oracle): a document of length ``n``
produces ``1`` chunk if ``n <= size`` else ``ceil((n - size) / stride)
+ 1`` chunks; chunk ``k`` is the codepoint slice ``[k*stride,
k*stride + size)``.  The final chunk may be shorter than ``size``; with
``stride < size`` consecutive chunks overlap by ``size - stride``
codepoints so no token span longer than the overlap is lost at a
boundary.  Indices are codepoints (DuckDB ``substr`` parity; Arrow's
``utf8_slice_codeunits`` slices codepoints for utf8 arrays).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def n_chunks_for_lengths(n: np.ndarray, size: int, stride: int) -> np.ndarray:
    """Vectorized chunk count: 1 if n <= size else ceil((n-size)/stride)+1."""
    extra = np.maximum(n - size, 0)
    return np.where(
        n <= size, 1, (extra + stride - 1) // stride + 1
    ).astype(np.int64)


def chunk_batch(tbl: pa.Table, text_col: str = "text",
                id_col: str = "doc_id", size: int = 120,
                stride: int = 90) -> pa.Table:
    """Explode one batch into (id, chunk_id, chunk_text, chunk_len) rows.

    One ``utf8_slice_codeunits`` call per chunk ordinal over the rows
    that still have a chunk at that ordinal — the per-batch loop is
    bounded by ``max_len/stride``, not by row count.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    text = pc.fill_null(pc.cast(tbl[text_col], pa.string()), "")
    n = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    counts = n_chunks_for_lengths(n, size, stride)
    max_k = int(counts.max()) if len(counts) else 0
    ids = tbl[id_col]
    pieces = []
    for k in range(max_k):
        mask = pa.array(counts > k)
        sub_ids = pc.filter(ids, mask)
        sub_text = pc.filter(text, mask)
        chunk = pc.utf8_slice_codeunits(
            sub_text, start=k * stride, stop=k * stride + size)
        pieces.append(pa.table({
            id_col: sub_ids,
            "chunk_id": pa.array(
                np.full(len(sub_ids), k, dtype=np.int64)),
            "chunk_text": chunk,
            "chunk_len": pc.cast(pc.utf8_length(chunk), pa.int64()),
        }))
    if not pieces:
        return pa.table({
            id_col: ids,
            "chunk_id": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
            "chunk_len": pa.array([], type=pa.int64()),
        })
    return pa.concat_tables(pieces)


def token_chunk_batch(tbl: pa.Table, tokens_col: str = "tokens",
                      id_col: str = "doc_id", size: int = 256,
                      stride: int = 192,
                      with_payload: bool = False) -> pa.Table:
    """Token-level context-length chunking over a ``list<int>`` column —
    the actual LLM preprocessing op (``chunk_batch`` is its char-level
    sibling).  Rows with a null token list are dropped (no defined
    chunks).  Emits ``(id, chunk_id, n_chunk, tok_sum)`` per window —
    ``tok_sum`` is the window's token sum, a cheap cross-engine
    checksum of the slice content; ``with_payload=True`` adds the
    sliced token list itself (``chunk_tokens``) for real exports.

    Vectorized over chunk ordinals: one ``list_slice`` kernel per
    ordinal; window sums via one cumulative-sum difference per ordinal
    (safe for empty windows, unlike ``reduceat``).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    tbl = tbl.filter(pc.is_valid(tbl[tokens_col]))
    lens = pc.list_value_length(tbl[tokens_col]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    counts = n_chunks_for_lengths(lens, size, stride)
    max_k = int(counts.max()) if len(counts) else 0
    pieces = []
    for k in range(max_k):
        mask = pa.array(counts > k)
        sub = tbl.filter(mask)
        sl = pc.list_slice(sub[tokens_col], start=k * stride,
                           stop=k * stride + size)
        ln = pc.list_value_length(sl).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(sl).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(flat)])
        offs = np.concatenate([[0], np.cumsum(ln)[:-1]])
        sums = cs[offs + ln] - cs[offs]
        cols = {
            id_col: sub[id_col],
            "chunk_id": pa.array(np.full(len(ln), k, dtype=np.int64)),
            "n_chunk": pa.array(ln, type=pa.int64()),
            "tok_sum": pa.array(sums, type=pa.int64()),
        }
        if with_payload:
            cols["chunk_tokens"] = sl
        pieces.append(pa.table(cols))
    if not pieces:
        cols = {
            id_col: tbl[id_col],
            "chunk_id": pa.array([], type=pa.int64()),
            "n_chunk": pa.array([], type=pa.int64()),
            "tok_sum": pa.array([], type=pa.int64()),
        }
        if with_payload:
            cols["chunk_tokens"] = tbl[tokens_col]
        return pa.table(cols)
    return pa.concat_tables(pieces)


def chunk_sequences(ds, tokens_col: str = "tokens", id_col: str = "doc_id",
                    size: int = 256, stride: int = 192,
                    with_payload: bool = False):
    """Dataset → token-window rows (streaming explode, no shuffle)."""
    return ds.map_batches(
        lambda t: token_chunk_batch(t, tokens_col=tokens_col,
                                    id_col=id_col, size=size,
                                    stride=stride,
                                    with_payload=with_payload),
        batch_format="pyarrow",
    )


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = 120, stride: int = 90):
    """Dataset → chunk rows.  Pure streaming explode; at 100 TB the only
    cost is the output volume itself (×size/stride amplification), which
    the streaming executor backpressures like any other map stage."""
    return ds.map_batches(
        lambda t: chunk_batch(t, text_col=text_col, id_col=id_col,
                              size=size, stride=stride),
        batch_format="pyarrow",
    )
