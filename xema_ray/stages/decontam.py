"""Train/eval decontamination — flag training documents that share any
word n-gram with a (small) evaluation set: the classic benchmark-leak
check a large-scale training-data pipeline runs before every export.

Shape: the EVAL side is small by definition (a benchmark), so its
distinct gram-hash set is computed in one streaming pass and broadcast
(``ray.put`` once, one read per task); the TRAIN side streams through a
vectorized ``map_batches`` — per batch one regex scan + factorize + gram
hash (:func:`xema_ray.functions.sketches.word_ngram_hashes`) and one
sorted ``np.isin`` against the broadcast set.  No shuffle at any size;
the 64-bit gram-hash space makes false positives ~n²/2⁶⁴.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z0-9]+")


def _batch_gram_hashes(texts, n: int):
    """(flat hashes, offsets) of word n-grams per text, set semantics."""
    from xema_ray.functions.sketches import unique_per_row, word_ngram_hashes

    s = pd.Series(texts, dtype="object").fillna("").str.lower()
    words_all = s.str.findall(_WORD_RE)
    flat, offsets = word_ngram_hashes(words_all, n)
    return unique_per_row(flat, offsets)


def eval_gram_set(eval_ds, text_col: str = "text", n: int = 8) -> np.ndarray:
    """Sorted distinct gram hashes of the evaluation set (one pass)."""

    def grams(t: pa.Table) -> pa.Table:
        flat, _ = _batch_gram_hashes(t[text_col].to_pylist(), n)
        return pa.table({"g": pa.array(np.unique(flat).view(np.int64),
                                       type=pa.int64())})

    parts = []
    for b in eval_ds.select_columns([text_col]).map_batches(
            grams, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        parts.append(b["g"].to_numpy(zero_copy_only=False))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts)).astype(np.int64).view(np.uint64)


def contaminated_docs(train_ds, eval_ds, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 8):
    """(id, n_hits) for every training doc sharing ≥1 word ``n``-gram
    with the eval set; ``n_hits`` = number of DISTINCT shared grams."""
    import ray

    gset = np.sort(eval_gram_set(eval_ds, text_col=text_col, n=n))
    gref = ray.put(gset)

    def flag(t: pa.Table) -> pa.Table:
        gs = ray.get(gref)
        flat, offsets = _batch_gram_hashes(t[text_col].to_pylist(), n)
        hit = np.zeros(len(flat), dtype=np.int64)
        if len(flat) and len(gs):
            idx = np.searchsorted(gs, flat)
            idx_c = np.minimum(idx, len(gs) - 1)
            hit = (gs[idx_c] == flat).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_hits = csum[offsets[1:]] - csum[offsets[:-1]]
        keep = n_hits > 0
        return pa.table({
            id_col: t[id_col].filter(pa.array(keep)),
            "n_hits": pa.array(n_hits[keep], type=pa.int64()),
        })

    return train_ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow")


def eval_gram_postings(eval_ds, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3):
    """Per-eval-item distinct gram sets as a broadcastable postings
    structure: ``(gram_keys sorted u64, offsets, eval_idx flat, eval_ids,
    set_sizes)`` — gram -> which eval items contain it.  One streaming
    pass; the whole structure is eval-set-sized (a benchmark, small by
    definition), never corpus-sized."""
    ids, grams = [], []
    for b in eval_ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow"):
        flat, offsets = _batch_gram_hashes(b[text_col].to_pylist(), n)
        bid = b[id_col].to_pylist()
        for i in range(len(bid)):
            ids.append(bid[i])
            grams.append(flat[offsets[i]:offsets[i + 1]])
    sizes = np.array([len(g) for g in grams], dtype=np.int64)
    if not len(ids) or not sizes.sum():
        return (np.empty(0, np.uint64), np.zeros(1, np.int64),
                np.empty(0, np.int64), ids, sizes)
    flat_g = np.concatenate([g for g in grams if len(g)])
    flat_e = np.repeat(np.arange(len(ids), dtype=np.int64), sizes)
    order = np.argsort(flat_g, kind="stable")
    flat_g, flat_e = flat_g[order], flat_e[order]
    starts = np.ones(len(flat_g), dtype=bool)
    starts[1:] = flat_g[1:] != flat_g[:-1]
    keys = flat_g[starts]
    offsets = np.concatenate([np.flatnonzero(starts),
                              [len(flat_g)]]).astype(np.int64)
    return keys, offsets, flat_e, ids, sizes


def fuzzy_contaminated_docs(train_ds, eval_ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            eval_id_col: str = "eval_id", n: int = 3,
                            threshold_ppm: int = 500_000):
    """NEAR-match decontamination: ``(doc, eval item)`` pairs whose
    distinct word-``n``-gram sets have Jaccard >= threshold — catches
    the paraphrased / lightly-edited benchmark leaks the exact-gram
    :func:`contaminated_docs` pass misses.

    Same zero-shuffle shape as the exact pass: the eval side's
    gram->items postings broadcast once (``ray.put``), the train side
    streams; per batch, matched grams gather their eval items and ONE
    ``np.unique`` over packed ``(doc_row, eval_idx)`` keys yields every
    intersection size in a single vectorized step (no per-pair loop, no
    minhash approximation — candidates are exactly the pairs sharing
    >= 1 gram, a superset of every pair above any positive threshold).
    Jaccard is emitted in fixed-point ppm (``inter * 10^6 // union``),
    the repo-wide hash-stable convention.
    """
    import ray

    keys, offs, flat_e, eval_ids, sizes = eval_gram_postings(
        eval_ds, text_col=text_col, id_col=id_col, n=n)
    n_eval = len(eval_ids)
    post_ref = ray.put((keys, offs, flat_e, sizes))
    if n_eval:
        ids_arr = pa.array(eval_ids)
    else:
        # an empty python list would infer Arrow's null type for the
        # eval_id column (breaking parquet writes / unions downstream);
        # pin it to the eval dataset's real id type (Ray schemas carry
        # Arrow types for Arrow blocks, numpy dtypes for pandas blocks)
        sch = eval_ds.schema()
        typ = dict(zip(sch.names, sch.types))[id_col]
        if not isinstance(typ, pa.DataType):
            typ = pa.from_numpy_dtype(typ)
        ids_arr = pa.array([], type=typ)

    def flag(t: pa.Table) -> pa.Table:
        ks, of, fe, sz = ray.get(post_ref)
        flat, offsets = _batch_gram_hashes(t[text_col].to_pylist(), n)
        empty = pa.table({
            id_col: t[id_col].slice(0, 0),
            eval_id_col: ids_arr.slice(0, 0),
            "n_shared": pa.array([], pa.int64()),
            "jaccard_ppm": pa.array([], pa.int64()),
        })
        if not len(flat) or not len(ks):
            return empty
        doc_rows = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                             np.diff(offsets))
        pos = np.searchsorted(ks, flat)
        pos_c = np.minimum(pos, len(ks) - 1)
        m = ks[pos_c] == flat
        if not m.any():
            return empty
        # expand matched grams to their eval items (vectorized gather:
        # absolute index = repeated posting start + within-group offset)
        mpos, mrows = pos_c[m], doc_rows[m]
        counts = of[mpos + 1] - of[mpos]
        cum = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(cum[-1], dtype=np.int64) \
            - np.repeat(cum[:-1], counts)
        e_items = fe[np.repeat(of[mpos], counts) + within]
        d_items = np.repeat(mrows, counts)
        packed = d_items * n_eval + e_items
        uk, inter = np.unique(packed, return_counts=True)
        dr, ei = uk // n_eval, uk % n_eval
        doc_sizes = np.diff(offsets)[dr]
        union = doc_sizes + sz[ei] - inter
        jacc = inter * 1_000_000 // np.maximum(union, 1)
        keep = jacc >= threshold_ppm
        dr, ei, inter, jacc = dr[keep], ei[keep], inter[keep], jacc[keep]
        return pa.table({
            id_col: t[id_col].take(pa.array(dr, pa.int64())),
            eval_id_col: ids_arr.take(pa.array(ei, pa.int64())),
            "n_shared": pa.array(inter.astype(np.int64)),
            "jaccard_ppm": pa.array(jacc.astype(np.int64)),
        })

    return train_ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pyarrow")
