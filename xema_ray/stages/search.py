"""Full-text top-k search over a document corpus — a BM25-family
ranking with EXACT integer arithmetic.

Reference scope: the reference engine (egze/xema) validates and
transforms tables but has no retrieval operator; this is one of the
training-data-pipeline extensions (corpus triage: "find the documents
most about X" before sampling / decontamination).

Why integer BM25: the classic ``idf = ln((N-df+0.5)/(df+0.5))`` is a
float, and float scores cannot hash-match across engines (a ULP decides
a rank).  Both factors are therefore replaced by integer surrogates
that keep BM25's shape (monotone in tf, 1/df; saturating in tf;
length-normalized) and are computable with ``//`` identically in
numpy and DuckDB:

- ``idf_s(term)  = ((2*(N-df)+1) * 10^6) // (2*df+1)`` — the argument
  of the BM25 log, rational, scaled (the log is monotone, so ranking by
  its argument preserves BM25's idf ordering per term).
- ``A = (10*T) // N`` — average document length, fixed-point ×10.
- ``tfq(tf, dl)  = (22000*A*tf) // (10*A*tf + 3*A + 90*dl)`` — the
  k1=1.2 / b=0.75 saturation term ×10^3: numerator and denominator of
  ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` multiplied through by
  ``10*A`` with avgdl ≈ A/10.
- ``score(doc)   = Σ_terms idf_s * tfq`` — int64-safe for N up to
  ~10^9 docs and dl up to ~10^5 (drop the idf scale to 10^3 beyond).

Execution shape (scales to an arbitrary corpus):

1. **Stats pass** — one streaming ``map_batches`` producing a single
   tiny partial row per batch: ``(n_docs, total_tokens, df_0..df_k)``
   where ``df_i`` counts batch docs containing query term *i*.  Docs
   never span batches, so summed partials are exact.  The exchange is
   O(batches × terms) — corpus-size-free.
2. **Score pass** — ``(N, T, idf table)`` broadcast once via
   ``ray.put``; each batch computes tf/dl vectorized (one explode +
   bincount per term), scores, and keeps a LOCAL top-k.  The driver
   merges ≤ k×batches candidate rows.  Same gather shape as
   :func:`xema_ray.stages.similarity.knn_brute_force`.

Tokenization matches the repo convention: ``lower`` + RE2
``[a-z0-9]+`` (same class in DuckDB ``regexp_extract_all``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z0-9]+")

IDF_SCALE = 1_000_000
TF_SCALE = 1_000  # folded into the 22000 = 22 * TF_SCALE constant


def _doc_words(texts):
    """pandas Series[str] -> exploded Series of words indexed by row."""
    return texts.fillna("").str.lower().str.findall(_WORD_RE) \
        .explode().dropna()


def corpus_term_stats(ds, terms, text_col: str = "text"):
    """One streaming pass -> ``(n_docs, total_tokens, df_per_term)``.

    ``df_per_term`` is a dict ``term -> document frequency``.  Exact:
    each batch holds whole documents, so per-batch distinct-doc counts
    sum across batches.
    """
    terms = list(terms)

    def partial(batch):
        import pandas as pd

        texts = batch[text_col].reset_index(drop=True)
        ex = _doc_words(texts)
        out = {"n_docs": [len(texts)], "tot": [int(len(ex))]}
        for i, term in enumerate(terms):
            hit = ex[ex == term]
            out[f"df{i}"] = [int(hit.index.nunique())]
        return pd.DataFrame(out)

    cols = ["n_docs", "tot"] + [f"df{i}" for i in range(len(terms))]
    tot = {c: 0 for c in cols}
    for b in ds.map_batches(partial, batch_format="pandas") \
            .iter_batches(batch_format="pyarrow"):
        for c in cols:
            tot[c] += int(pa.compute.sum(b[c]).as_py() or 0)
    df = {t: tot[f"df{i}"] for i, t in enumerate(terms)}
    return tot["n_docs"], tot["tot"], df


def idf_scaled(n_docs: int, df: int) -> int:
    """Integer idf surrogate (see module docstring)."""
    return ((2 * (n_docs - df) + 1) * IDF_SCALE) // (2 * df + 1)


class _BM25Score:
    """Actor/task-pool stage: per-batch integer BM25 scores + local
    top-k.  Query-side state (idf table, N, T) read from the object
    store once per actor."""

    def __init__(self, params_ref, text_col: str = "text", k: int = 10):
        import ray

        self.terms, self.idf, self.n_docs, self.avgdl10 = \
            ray.get(params_ref)
        self.text_col = text_col
        self.k = k

    def __call__(self, batch):
        import pandas as pd

        texts = batch[self.text_col].reset_index(drop=True)
        n = len(texts)
        ex = _doc_words(texts)
        rows = ex.index.to_numpy(dtype=np.int64)
        dl = np.bincount(rows, minlength=n).astype(np.int64)
        a = np.int64(self.avgdl10)
        score = np.zeros(n, dtype=np.int64)
        words = ex.to_numpy()
        for term, idf_s in zip(self.terms, self.idf):
            sel = rows[words == term]
            if not len(sel):
                continue
            tf = np.bincount(sel, minlength=n).astype(np.int64)
            tfq = np.where(
                tf > 0,
                (22_000 * a * tf) // (10 * a * tf + 3 * a + 90 * dl),
                0)
            score += np.int64(idf_s) * tfq
        keep = np.flatnonzero(score > 0)
        if len(keep) > self.k:
            # local top-k under the global order (score desc, id asc)
            ids = batch["doc_id"].reset_index(drop=True) \
                .iloc[keep].to_numpy()
            order = np.lexsort((ids, -score[keep]))[: self.k]
            keep = keep[order]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].reset_index(drop=True)
            .iloc[keep].to_numpy(),
            "score": score[keep],
        })


def bm25_topk(ds, terms, k: int = 10, text_col: str = "text",
              stats=None):
    """Top-``k`` documents for ``terms`` by the integer BM25 surrogate.

    Returns a pyarrow Table ``(doc_id, score)`` sorted score desc,
    doc_id asc — a driver-sized result (≤ k rows).  ``stats`` overrides
    the stats pass with precomputed ``(n_docs, total_tokens, df_dict)``
    (reuse across many queries over one corpus).
    """
    import ray

    terms = list(terms)
    id_type = ds.schema().base_schema.field("doc_id").type
    empty = pa.table({"doc_id": pa.array([], id_type),
                      "score": pa.array([], pa.int64())})
    n_docs, tot, df = stats if stats is not None else \
        corpus_term_stats(ds, terms, text_col)
    if n_docs == 0 or tot == 0:
        return empty
    idf = [idf_scaled(n_docs, df[t]) for t in terms]
    avgdl10 = (10 * tot) // n_docs
    params_ref = ray.put((terms, idf, n_docs, avgdl10))

    cand = ds.map_batches(
        _BM25Score,
        fn_constructor_kwargs={"params_ref": params_ref,
                               "text_col": text_col, "k": k},
        batch_format="pandas", concurrency=(1, 8),
    )
    frames = [b.to_pandas() for b in
              cand.iter_batches(batch_format="pyarrow")]
    import pandas as pd

    allc = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame({"doc_id": [], "score": []})
    if not len(allc):
        return empty
    order = np.lexsort((allc["doc_id"].to_numpy(),
                        -allc["score"].to_numpy(dtype=np.int64)))[:k]
    out = allc.iloc[order]
    return pa.table({"doc_id": pa.array(out["doc_id"], id_type),
                     "score": pa.array(out["score"].to_numpy(dtype=np.int64),
                                       pa.int64())})
