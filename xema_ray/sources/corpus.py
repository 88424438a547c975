"""Deterministic synthetic corpus generator — the ``input_hint`` table.

Generates the Parquet corpus of pre-tokenized training sequences
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
(BASELINE.json:input_hint; FIXTURES.md F1/F2/F4) fully seeded — no external
data.  Error injection rates follow FIXTURES.md F1:

* duplicate ``doc_id`` at 1e-3 (re-emit a prior id),
* token values out of [0, 50257) at 1e-4 (−1 or 60000),
* ``n_tok`` off-by-one at 1e-4,
* unknown ``source`` value ``bad-src`` at 1e-4,
* nulls in every column at 1e-4,
* within-row duplicate token runs in 5% of rows,
* drift variant (seed 43): ``web`` token lengths lognormal(μ=6.1)
  instead of 5.5 (F4).

Generation is vectorized numpy; lists are assembled directly from a values
buffer + offsets (zero-copy into Arrow).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = ("web", "books", "code", "wiki", "forums")
SOURCE_PROBS = (0.90, 0.05, 0.03, 0.015, 0.005)
VOCAB = 50257
MAX_LEN = 4096

DUP_ID_RATE = 1e-3
BAD_TOKEN_RATE = 1e-4
BAD_NTOK_RATE = 1e-4
BAD_SRC_RATE = 1e-4
NULL_RATE = 1e-4
DUP_RUN_RATE = 0.05


def make_sequences_table(
    n_rows: int,
    seed: int = 42,
    start_index: int = 0,
    shifted: bool = False,
    clean: bool = False,
) -> pa.Table:
    """One shard of the sequences corpus as a ``pa.Table``.

    ``start_index`` offsets doc numbering so multi-shard corpora have
    globally unique (modulo injected duplicates) ids.  ``clean=True``
    disables error injection (for drift-reference and oracle fixtures).
    """
    rng = np.random.default_rng((seed, start_index))

    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_PROBS)
    sources = np.array(SOURCES, dtype=object)[src_idx]

    mu = np.where((src_idx == 0) & shifted, 6.1, 5.5)
    lengths = np.clip(
        np.exp(rng.normal(mu, 0.6, size=n_rows)).astype(np.int64), 1, MAX_LEN
    )
    total = int(lengths.sum())
    values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    # within-row duplicate runs: first token value repeated over a run
    if not clean:
        dup_rows = np.nonzero(rng.random(n_rows) < DUP_RUN_RATE)[0]
        runs = 1 + rng.integers(1, 8, size=len(dup_rows))
        for r, run in zip(dup_rows, runs):
            s, e = offsets[r], offsets[r + 1]
            if e - s >= 2:
                values[s : s + min(int(e - s), int(run))] = values[s]

    n_tok = lengths.astype(np.int32)
    ids = np.arange(start_index, start_index + n_rows, dtype=np.int64)
    doc_id = np.array([f"{s}-{i:012d}" for s, i in zip(sources, ids)], dtype=object)

    if not clean:
        # out-of-range token values: O(k) sampling instead of a
        # total-length uniform draw (the dominant generation cost)
        n_bad = rng.binomial(total, BAD_TOKEN_RATE)
        bad_idx = rng.choice(total, size=n_bad, replace=False) if n_bad else \
            np.empty(0, dtype=np.int64)
        values[bad_idx] = np.where(rng.random(n_bad) < 0.5, -1, 60000)
        # off-by-one n_tok
        bad_n = rng.random(n_rows) < BAD_NTOK_RATE
        n_tok = np.where(bad_n, n_tok + 1, n_tok).astype(np.int32)
        # duplicate doc ids (re-emit a prior id)
        dup_id = np.nonzero(rng.random(n_rows) < DUP_ID_RATE)[0]
        dup_id = dup_id[dup_id > 0]
        for r in dup_id:
            doc_id[r] = doc_id[rng.integers(0, r)]
        # unknown source
        bad_src = rng.random(n_rows) < BAD_SRC_RATE
        sources = np.where(bad_src, "bad-src", sources)

    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(values, type=pa.int32()),
    )
    cols = {
        "doc_id": pa.array(doc_id, type=pa.string()),
        "tokens": tokens_arr,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(sources, type=pa.string()),
    }
    tbl = pa.table(cols)

    if not clean:
        # nulls at 1e-4 per column
        masks = {c: rng.random(n_rows) < NULL_RATE for c in tbl.column_names}
        arrays = []
        for c in tbl.column_names:
            arr = tbl[c].combine_chunks()
            m = masks[c]
            if m.any():
                arr = _null_out(arr, m)
            arrays.append(arr)
        tbl = pa.table(dict(zip(tbl.column_names, arrays)))
    return tbl


def _null_out(arr: pa.Array, mask: np.ndarray) -> pa.Array:
    """Return ``arr`` with positions in ``mask`` set to null."""
    import pyarrow.compute as pc

    return pc.if_else(pa.array(mask), pa.nulls(len(arr), type=arr.type), arr)


def sources_dim_table() -> pa.Table:
    """F2 dimension table — the referential target for ``source``."""
    return pa.table({
        "source": pa.array(list(SOURCES), type=pa.string()),
        "license": pa.array(["cc", "mixed", "permissive", "cc-by-sa", "mixed"]),
    })


def write_corpus(
    out_dir: str,
    n_rows: int,
    n_files: int = 8,
    seed: int = 42,
    shifted: bool = False,
    clean: bool = False,
) -> str:
    """Write an ``n_files``-shard corpus + ``sources.parquet`` dim table.

    Idempotent: skips generation when the directory is already complete
    (marker file carries the generation parameters).
    """
    marker = os.path.join(out_dir, "_COMPLETE")
    params = f"{n_rows}:{n_files}:{seed}:{shifted}:{clean}:v2"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == params:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = n_rows // n_files
    for i in range(n_files):
        rows = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        tbl = make_sequences_table(
            rows, seed=seed, start_index=i * per, shifted=shifted, clean=clean
        )
        pq.write_table(tbl, os.path.join(out_dir, f"seq-{i:05d}.parquet"))
    pq.write_table(sources_dim_table(), os.path.join(out_dir, "sources.parquet"))
    with open(marker, "w") as f:
        f.write(params)
    return out_dir


def write_nested_table(out_path: str, n_rows: int, seed: int = 42) -> str:
    """Deterministic nested-struct table ``(rec_id, meta: struct<lang,
    score, inner: struct<k>>)`` with injected violations — exercises the
    recursive struct-column validation path.  Idempotent."""
    if os.path.exists(out_path):
        return out_path
    rng = np.random.default_rng(seed)
    langs = np.where(rng.random(n_rows) < 0.01, "xx",
                     np.where(rng.random(n_rows) < 0.5, "en", "de")).astype(object)
    langs[rng.random(n_rows) < 0.01] = None
    scores = np.round(rng.random(n_rows), 3)
    scores[rng.random(n_rows) < 0.01] = 1.5  # out of [0, 1]
    ks = rng.integers(0, 100, size=n_rows)
    ks[rng.random(n_rows) < 0.01] = -1
    tbl = pa.table({
        "rec_id": pa.array(np.arange(n_rows), type=pa.int64()),
        "meta": pa.StructArray.from_arrays(
            [pa.array(langs, type=pa.string()),
             pa.array(scores, type=pa.float64()),
             pa.StructArray.from_arrays([pa.array(ks, type=pa.int64())],
                                        names=["k"])],
            names=["lang", "score", "inner"],
        ),
    })
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out_path)
    return out_path


def corpus_paths(corpus_dir: str) -> list:
    return sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.startswith("seq-") and f.endswith(".parquet")
    )
