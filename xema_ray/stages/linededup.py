"""Cross-corpus line-level deduplication (CCNet-style).

CCNet/C4-style cleaning removes LINES that repeat across many documents
(boilerplate: navigation bars, cookie banners, license footers) while
keeping the rest of each document.  The reference validates single
values only; at corpus scale this is a counting shuffle:

1. **segment** — each document's word stream is cut into fixed-width
   "lines" of ``words_per_line`` words (the corpus has no natural
   newlines; a real web corpus would split on ``\\n`` instead — the
   counting/filter machinery is identical either way).
2. **count** — per-batch partials ``(line_hash, doc_hash)`` pairs,
   capped at the ``max_docs + 1`` SMALLEST distinct doc hashes per
   line (a k-minimum-values set: the global k smallest distinct
   values each survive their own batch's cap, so the merged union
   decides ``distinct_docs > max_docs`` exactly even when one
   ``doc_id``'s rows are split across batches).  Only 16-byte digest
   pairs shuffle, never line text — and the counting pass is
   STRING-FREE: line hashes are positional-polynomial mixes of
   per-word hashes (factorize once per batch, hash the unique
   vocabulary once, one ``add.reduceat`` per batch), the
   :func:`~xema_ray.functions.sketches.word_ngram_hashes` trick
   applied to variable-width segments.  Doc identity is a 64-bit
   xxhash of the id string (collisions would undercount distinct
   docs; at 64 bits this is negligible for any real corpus).
3. **broadcast** — lines with ``n_docs > max_docs`` form the "common
   line" set: O(boilerplate lines), small by assumption, shipped once
   via ``ray.put`` and read once per actor.
4. **filter** — a second streaming pass re-hashes each doc's lines,
   drops common lines with one ``searchsorted`` membership test, and
   reassembles ``clean_text`` with ONE join per document (separator
   prefixes computed vectorized; line strings are never materialized
   for dropped lines).

Merge strategy for steps 2-3 mirrors ``_collect_dup_groups``
(driver fold below ``auto_driver_limit`` partial rows, coarse
hash-bucket ``groupby(bucket).map_groups`` above — the multi-node path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = r"[a-z0-9]+"


def _word_stream(texts: pd.Series):
    """Explode the batch into its word stream: ``(words pd.Series
    indexed by row, rows ndarray, pos-in-doc ndarray)``."""
    import re

    words = texts.str.findall(re.compile(_WORD_RE))
    ex = words.explode().dropna()
    if not len(ex):
        return ex, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = ex.index.to_numpy().astype(np.int64)
    starts = np.ones(len(rows), dtype=bool)
    starts[1:] = rows[1:] != rows[:-1]
    first_of_row = np.flatnonzero(starts)
    pos = np.arange(len(rows), dtype=np.int64)
    pos -= np.repeat(pos[first_of_row], np.diff(
        np.append(first_of_row, len(rows))))
    return ex, rows, pos


def _line_hashes_from_stream(ex: pd.Series, rows: np.ndarray,
                             pos: np.ndarray, words_per_line: int):
    """String-free line digests: ``(line_rows, line_no, line_hash,
    line_starts)`` — one 64-bit hash per (doc, line) without building
    line strings.  Words hash once per batch vocabulary; a line's hash
    is the wrapped sum of position-mixed word hashes (order-sensitive:
    equal word sequences ⇒ equal hashes, independent of batching)."""
    from xema_ray.functions.sketches import hash_strings, splitmix64

    if not len(ex):
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64), e
    line_no = pos // words_per_line
    pos_in_line = (pos % words_per_line).astype(np.uint64)
    codes, uniq = pd.factorize(ex.to_numpy())
    wh = hash_strings(uniq.astype(object))
    pos_mix = splitmix64(np.arange(words_per_line, dtype=np.uint64)
                         + np.uint64(0x51ED2701))
    terms = splitmix64(wh[codes] ^ pos_mix[pos_in_line])
    starts = np.ones(len(rows), dtype=bool)
    starts[1:] = (rows[1:] != rows[:-1]) | (line_no[1:] != line_no[:-1])
    sidx = np.flatnonzero(starts)
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(terms, sidx)
    return rows[sidx], line_no[sidx], splitmix64(sums), sidx


def _segment_batch(texts: pd.Series, words_per_line: int):
    """Line STRINGS (used by tests and ad-hoc callers; the engine's hot
    paths are string-free): ``(rows, line_no, lines)``."""
    ex, rows, pos = _word_stream(texts)
    if not len(ex):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object))
    line_no = pos // words_per_line
    df = pd.DataFrame({"r": rows, "ln": line_no,
                       "w": ex.to_numpy(dtype=object)})
    g = df.groupby(["r", "ln"], sort=True)["w"].agg(" ".join)
    idx = g.index
    return (idx.get_level_values(0).to_numpy(dtype=np.int64),
            idx.get_level_values(1).to_numpy(dtype=np.int64),
            g.to_numpy(dtype=object))


def common_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                 words_per_line: int = 8, max_docs: int = 1,
                 strategy: str = "auto",
                 auto_driver_limit: int = 8_000_000) -> np.ndarray:
    """Sorted uint64 hashes of lines occurring in more than ``max_docs``
    distinct documents — the broadcastable boilerplate set."""
    from xema_ray.functions.sketches import hash_strings
    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()
    kmv = max_docs + 1  # k-minimum-values cap per (batch, line)

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pandas().fillna("").str.lower() \
            .reset_index(drop=True)
        ex, rows, pos = _word_stream(texts)
        lrows, _, h, _ = _line_hashes_from_stream(ex, rows, pos,
                                                  words_per_line)
        # distinct (doc HASH, line) pairs — count(DISTINCT doc_id)
        # semantics: the doc's VALUE is the identity (not the batch-row
        # index), and hashing it makes partials mergeable across
        # batches even when one doc_id's rows are split between them.
        # Cap at the kmv smallest doc hashes per line: the global kmv
        # smallest distinct values survive every per-batch cap, so the
        # merged union decides `distinct > max_docs` exactly.
        codes, uniq_ids = pd.factorize(t[id_col].to_pandas().to_numpy())
        uniq_ids = np.asarray(uniq_ids)
        if uniq_ids.dtype != object or (
                len(uniq_ids) and not isinstance(uniq_ids[0], str)):
            uniq_ids = uniq_ids.astype(str)  # hash the id's string form
        dh_vocab = hash_strings(uniq_ids.astype(object))
        # factorize marks null ids as code -1, which would WRAP to the
        # batch's last real doc (or IndexError on an all-null batch);
        # all null-id rows share one fixed pseudo-doc identity instead
        dh_rows = np.full(len(codes), np.uint64(0x9E3779B97F4A7C15),
                          dtype=np.uint64)
        valid_code = codes >= 0
        if valid_code.any():
            dh_rows[valid_code] = dh_vocab[codes[valid_code]]
        if len(h):
            pair = np.stack([h, dh_rows[lrows]], axis=1)
            pair = np.unique(pair, axis=0)  # sorted by (h, dh)
            starts = np.ones(len(pair), dtype=bool)
            starts[1:] = pair[1:, 0] != pair[:-1, 0]
            sidx = np.flatnonzero(starts)
            rank = np.arange(len(pair), dtype=np.int64)
            rank -= np.repeat(rank[sidx], np.diff(
                np.append(sidx, len(pair))))
            pair = pair[rank < kmv]
        else:
            pair = np.empty((0, 2), dtype=np.uint64)
        return pa.table({
            "h": pa.array(pair[:, 0], type=pa.uint64()),
            "dh": pa.array(pair[:, 1], type=pa.uint64()),
            "bucket": pa.array((pair[:, 0] % n_buckets).astype(np.int32),
                               type=pa.int32()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> np.ndarray:
        if not len(df):
            return np.empty(0, dtype=np.uint64)
        pair = np.stack([df["h"].to_numpy(dtype=np.uint64),
                         df["dh"].to_numpy(dtype=np.uint64)], axis=1)
        pair = np.unique(pair, axis=0)
        uniq, cnt = np.unique(pair[:, 0], return_counts=True)
        return uniq[cnt > max_docs]

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
            return filter_lines_batch(batch, self.common,
                                      text_col=text_col, id_col=id_col,
                                      words_per_line=words_per_line,
                                      join_sep=join_sep)

    return ds.map_batches(KeepLines, batch_format="pandas",
                          concurrency=concurrency)


def filter_lines_batch(batch: pd.DataFrame, common: np.ndarray,
                       text_col: str = "text", id_col: str = "doc_id",
                       words_per_line: int = 8,
                       join_sep: str = "\n") -> pd.DataFrame:
    """The line-filter kernel for one batch against a SORTED common-line
    hash set: one hash pass + one ``searchsorted`` membership test +
    ONE join per document (separator prefixes — "" doc-start,
    ``join_sep`` line-start, " " in-line — computed vectorized)."""
    n = len(batch)
    texts = batch[text_col].fillna("").str.lower().reset_index(drop=True)
    ex, rows, pos = _word_stream(texts)
    lrows, _, h, line_starts = _line_hashes_from_stream(
        ex, rows, pos, words_per_line)
    if len(h) and len(common):
        p = np.searchsorted(common, h)
        p = np.minimum(p, len(common) - 1)
        keep = common[p] != h
    else:
        keep = np.ones(len(h), dtype=bool)
    n_lines = np.bincount(lrows, minlength=n).astype(np.int64)
    n_kept = np.bincount(lrows[keep], minlength=n).astype(np.int64)
    clean = np.full(n, "", dtype=object)
    if len(ex) and keep.any():
        line_len = np.diff(np.append(line_starts, len(rows)))
        word_keep = np.repeat(keep, line_len)
        kw = ex.to_numpy(dtype=object)[word_keep]
        krows = rows[word_keep]
        kpos = pos[word_keep]
        sep = np.full(len(kw), " ", dtype=object)
        line_start = (kpos % words_per_line == 0)
        sep[line_start] = join_sep
        doc_start = np.ones(len(kw), dtype=bool)
        doc_start[1:] = krows[1:] != krows[:-1]
        sep[doc_start] = ""
        joined = pd.Series(sep + kw).groupby(krows).agg("".join)
        clean[joined.index.to_numpy()] = joined.to_numpy()
    return pd.DataFrame({
        "doc_id": batch[id_col].reset_index(drop=True),
        "n_lines": n_lines,
        "n_kept": n_kept,
        "clean_text": clean,
    })


def _line_filter_table(tbl, common, text_col, id_col, words_per_line,
                       join_sep):
    """pyarrow-in/pyarrow-out adapter for the checkpointed shard map."""
    import pyarrow as pa_

    out = filter_lines_batch(tbl.to_pandas(), common, text_col=text_col,
                             id_col=id_col, words_per_line=words_per_line,
                             join_sep=join_sep)
    return pa_.Table.from_pandas(out, preserve_index=False)


def run_line_dedup(paths, out_dir: str, text_col: str = "text",
                   id_col: str = "doc_id", words_per_line: int = 8,
                   max_docs: int = 1, join_sep: str = "\n",
                   batch_rows: int = 16384):
    """Checkpointed, RESUMABLE cross-corpus line dedup — the production
    runner (mirrors ``run_exact_dedup``):

    1. the common-line set is computed once and persisted to
       ``<out_dir>/common_lines.parquet`` with a signature covering
       every input shard's lineage (size + mtime_ns) AND the config —
       a rerun with unchanged inputs loads it instead of recounting;
    2. the filter pass runs through
       :func:`~xema_ray.state.checkpoint.run_map_shards` (one Ray task
       per shard, atomic per-shard parquet, manifest resume); its
       config signature embeds a digest of the common set, so a
       changed input corpus invalidates exactly the downstream shards.

    Returns the :class:`~xema_ray.state.checkpoint.MapSummary`.
    """
    import functools
    import hashlib
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from xema_ray.state.checkpoint import _lineage, run_map_shards

    paths = sorted(paths)
    os.makedirs(out_dir, exist_ok=True)
    cfg = {"wpl": words_per_line, "max_docs": max_docs,
           "text_col": text_col, "sep": join_sep}
    sig = hashlib.md5(json.dumps(
        [cfg] + [_lineage(p) for p in paths]).encode()).hexdigest()
    common_file = os.path.join(out_dir, "common_lines.parquet")
    sig_file = common_file + ".sig"
    if (os.path.exists(common_file) and os.path.exists(sig_file)
            and open(sig_file).read() == sig):
        common = pq.read_table(common_file)["h"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
    else:
        common = common_lines(rd.read_parquet(paths), text_col=text_col,
                              id_col=id_col,
                              words_per_line=words_per_line,
                              max_docs=max_docs)
        tmp = common_file + ".tmp"
        pq.write_table(
            pa.table({"h": pa.array(common, type=pa.uint64())}), tmp)
        os.replace(tmp, common_file)
        with open(sig_file, "w") as f:
            f.write(sig)
    common_sig = hashlib.md5(common.tobytes()).hexdigest()[:16]
    fn = functools.partial(_line_filter_table, common=common,
                           text_col=text_col, id_col=id_col,
                           words_per_line=words_per_line,
                           join_sep=join_sep)
    return run_map_shards(
        paths, out_dir, fn, columns=[id_col, text_col],
        cfg_sig=f"linededup:{json.dumps(cfg, sort_keys=True)}"
                f":common={common_sig}",
        batch_rows=batch_rows)
