"""Cross-corpus line-level deduplication (CCNet-style).

CCNet/C4-style cleaning removes LINES that repeat across many documents
(boilerplate: navigation bars, cookie banners, license footers) while
keeping the rest of each document.  The reference validates single
values only; at corpus scale this is a counting shuffle:

1. **segment** — each document's word stream is cut into fixed-width
   "lines" of ``words_per_line`` words (the corpus has no natural
   newlines; a real web corpus would split on ``\\n`` instead — the
   counting/filter machinery is identical either way).
2. **count** — per-batch partials ``(line_hash, min_doc, n_docs)`` where
   ``n_docs`` counts DISTINCT docs in the batch containing that line
   (a doc never spans batches, so partial counts sum exactly).  Only
   16-byte digests shuffle, never line text — same digest-only exchange
   as :func:`xema_ray.stages.dedup.exact_dedup`.
3. **broadcast** — lines with ``n_docs > max_docs`` form the "common
   line" set: O(boilerplate lines), small by assumption, shipped once
   via ``ray.put`` and read once per actor.
4. **filter** — a second streaming pass re-segments each doc, drops
   common lines with one ``np.isin`` against the broadcast set, and
   reassembles ``clean_text``.

Merge strategy for step 2/3 mirrors ``_collect_dup_groups``
(driver fold below ``auto_driver_limit`` partial rows, coarse
hash-bucket ``groupby(bucket).map_groups`` above — the multi-node path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = r"[a-z0-9]+"


def _segment_batch(texts: pd.Series, words_per_line: int):
    """Vectorized segmentation: returns ``(rows, line_no, lines)`` —
    one entry per line, rows is the batch-row index of each line.

    One explode + one ``'' .join``-free reassembly: lines are built by
    joining word slices per (row, line_no) group with a single pandas
    ``groupby().agg`` — the join itself is per-line (the output unit),
    never per word pair.
    """
    import re

    words = texts.str.findall(re.compile(_WORD_RE))
    ex = words.explode().dropna()
    if not len(ex):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object))
    rows = ex.index.to_numpy().astype(np.int64)
    # word position within its doc -> fixed-width line number
    starts = np.ones(len(rows), dtype=bool)
    starts[1:] = rows[1:] != rows[:-1]
    first_of_row = np.flatnonzero(starts)
    pos = np.arange(len(rows), dtype=np.int64)
    pos -= np.repeat(pos[first_of_row], np.diff(
        np.append(first_of_row, len(rows))))
    line_no = pos // words_per_line
    df = pd.DataFrame({"r": rows, "ln": line_no,
                       "w": ex.to_numpy(dtype=object)})
    g = df.groupby(["r", "ln"], sort=True)["w"].agg(" ".join)
    idx = g.index
    return (idx.get_level_values(0).to_numpy(dtype=np.int64),
            idx.get_level_values(1).to_numpy(dtype=np.int64),
            g.to_numpy(dtype=object))


def _line_hashes(lines: np.ndarray) -> np.ndarray:
    """64-bit vectorized line digests (engine-internal only — the SQL
    oracle groups on the line STRINGS, so the hash space is free)."""
    from xema_ray.functions.sketches import hash_strings

    if not len(lines):
        return np.empty(0, dtype=np.uint64)
    return hash_strings(lines)


def common_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                 words_per_line: int = 8, max_docs: int = 1,
                 strategy: str = "auto",
                 auto_driver_limit: int = 8_000_000) -> np.ndarray:
    """Sorted uint64 hashes of lines occurring in more than ``max_docs``
    distinct documents — the broadcastable boilerplate set."""
    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pandas().fillna("").str.lower() \
            .reset_index(drop=True)
        rows, _, lines = _segment_batch(texts, words_per_line)
        h = _line_hashes(lines)
        # distinct (doc, line) first: a line repeated inside one doc
        # counts that doc once (count(DISTINCT doc_id) semantics)
        key = np.stack([rows.astype(np.uint64), h], axis=1) if len(h) \
            else np.empty((0, 2), dtype=np.uint64)
        key = np.unique(key, axis=0)
        uh, cnt = (np.unique(key[:, 1], return_counts=True)
                   if len(key) else (np.empty(0, np.uint64),
                                     np.empty(0, np.int64)))
        return pa.table({
            "h": pa.array(uh.astype(np.uint64), type=pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            "bucket": pa.array((uh % n_buckets).astype(np.int32),
                               type=pa.int32()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> np.ndarray:
        if not len(df):
            return np.empty(0, dtype=np.uint64)
        h = df["h"].to_numpy(dtype=np.uint64)
        uniq, inv = np.unique(h, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, df["cnt"].to_numpy(dtype=np.int64))
        return uniq[sums > max_docs]

    if strategy == "auto":
        partials = partials.materialize()
        strategy = "driver" if partials.count() <= auto_driver_limit \
            else "groupby"
    if strategy == "driver":
        frames = [b.to_pandas() for b in
                  partials.iter_batches(batch_format="pyarrow")]
        common = fold(pd.concat(frames, ignore_index=True)) if frames \
            else np.empty(0, dtype=np.uint64)
    else:
        # each digest lands in exactly one bucket -> per-bucket folds are
        # globally complete; only boilerplate digests leave the workers
        rows = partials.groupby("bucket").map_groups(
            lambda g: pd.DataFrame(
                {"h": fold(g.drop(columns=["bucket"]))}),
            batch_format="pandas").take_all()
        common = np.array([r["h"] for r in rows], dtype=np.uint64)
    return np.sort(common)


def line_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
               words_per_line: int = 8, max_docs: int = 1,
               strategy: str = "auto", join_sep: str = "\n",
               concurrency=(1, 8)):
    """Per-document cleaning result ``(doc_id, n_lines, n_kept,
    clean_text)`` with cross-corpus common lines removed.

    The input is consumed twice (count pass + filter pass) — compose
    with ``exact_dedup_project``-style thin materialization upstream if
    the producer chain is expensive.
    """
    import ray

    common = common_lines(ds, text_col=text_col, id_col=id_col,
                          words_per_line=words_per_line, max_docs=max_docs,
                          strategy=strategy)
    common_ref = ray.put(common)

    class KeepLines:
        def __init__(self):
            self.common = ray.get(common_ref)  # one plasma read per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n = len(batch)
            texts = batch[text_col].fillna("").str.lower() \
                .reset_index(drop=True)
            rows, line_no, lines = _segment_batch(texts, words_per_line)
            h = _line_hashes(lines)
            keep = ~np.isin(h, self.common, assume_unique=False) \
                if len(h) else np.empty(0, dtype=bool)
            n_lines = np.bincount(rows, minlength=n).astype(np.int64)
            n_kept = np.bincount(rows[keep], minlength=n).astype(np.int64)
            clean = np.full(n, "", dtype=object)
            if keep.any():
                kdf = pd.DataFrame({"r": rows[keep], "l": lines[keep]})
                # _segment_batch returns (row, line_no)-sorted entries,
                # so a stable groupby join preserves document order
                joined = kdf.groupby("r", sort=True)["l"].agg(
                    join_sep.join)
                clean[joined.index.to_numpy()] = joined.to_numpy()
            return pd.DataFrame({
                "doc_id": batch[id_col].reset_index(drop=True),
                "n_lines": n_lines,
                "n_kept": n_kept,
                "clean_text": clean,
            })

    return ds.map_batches(KeepLines, batch_format="pandas",
                          concurrency=concurrency)
