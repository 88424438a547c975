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
