"""Byte-pair-encoding tokenizer TRAINING + application.

The missing piece between a raw corpus and the token-id pipelines
(`text.tokenize_ids` is the word-level stand-in; this is the real
subword algorithm, Sennrich et al. 2016, ACL — public knowledge).

Scale shape
-----------
BPE training famously does NOT need the corpus — it needs the *word
frequency table* (Sennrich's own reference implementation trains on
``dict[word, count]``).  So the distributed part is exactly one
vocab-bounded counting fold (:func:`~xema_ray.stages.text.
global_word_counts`: per-batch factorize+bincount partials, driver
byte-sort merge — O(vocab) driver state by Heaps' law, ~10^7 words at
100 TB), and the merge loop runs driver-side over that compact table.
Application broadcasts the merge ranks once (``ray.put``) and encodes
per batch with a per-actor cache keyed on UNIQUE words — per-batch work
is O(distinct words), not O(tokens).

Determinism: merge selection is (count DESC, pair ASC) — a total
order, so the learned table is bit-stable across partitionings and CPU
counts (the counting fold is exact integers).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

END = "</w>"


# ----------------------------------------------------------------------
# driver-side training over the compact (word, count) table
# ----------------------------------------------------------------------


def _pair_stats(vocab: List[Tuple[Tuple[str, ...], int]]):
    """Pair frequencies + inverted index pair → {word_idx: occurrences}.

    The index is what makes each merge O(words containing the pair)
    instead of O(vocab) — the standard incremental structure."""
    stats: Counter = Counter()
    where: Dict[tuple, Dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for i, (sym, c) in enumerate(vocab):
        for pair in zip(sym, sym[1:]):
            stats[pair] += c
            where[pair][i] += 1
    return stats, where


def _merge_word(sym: Tuple[str, ...], pair: Tuple[str, str]
                ) -> Tuple[str, ...]:
    a, b = pair
    out, i, n = [], 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_merges_from_counts(words, counts, n_merges: int = 200,
                           min_count: int = 1):
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    ``words`` may be bytes (the ``S``-dtype array
    :func:`global_word_counts` returns) or str.  Returns a list of
    ``(rank, left, right, count_at_merge)`` rows.  Stops early when no
    pair reaches ``min_count``.
    """
    agg: Dict[Tuple[str, ...], int] = {}
    for w, c in zip(words, counts):
        s = w.decode() if isinstance(w, (bytes, np.bytes_)) else str(w)
        if not s:
            continue
        sym = tuple(s) + (END,)
        agg[sym] = agg.get(sym, 0) + int(c)
    vocab = list(agg.items())
    stats, where = _pair_stats(vocab)

    merges = []
    for rank in range(n_merges):
        best, best_c = None, min_count - 1
        for pair, c in stats.items():
            if c > best_c or (c == best_c and best is not None
                              and pair < best):
                best, best_c = pair, c
        if best is None:
            break
        merges.append((rank, best[0], best[1], int(best_c)))
        # touch only the words that contain the winning pair
        for i, _occ in list(where[best].items()):
            sym, c = vocab[i]
            new = _merge_word(sym, best)
            if new == sym:
                continue
            for p in zip(sym, sym[1:]):
                stats[p] -= c
                d = where[p]
                d[i] -= 1
                if d[i] <= 0:
                    del d[i]
            for p in zip(new, new[1:]):
                stats[p] += c
                where[p][i] += 1
            vocab[i] = (new, c)
        stats = Counter({p: c for p, c in stats.items() if c > 0})
    return merges


def learn_bpe(ds, n_merges: int = 200, text_col: str = "text",
              min_count: int = 1):
    """Distributed counting fold + driver merge loop → merge table."""
    from xema_ray.stages.text import global_word_counts

    words, counts = global_word_counts(ds, text_col)
    return bpe_merges_from_counts(words, counts, n_merges,
                                  min_count=min_count)


def merges_table(merges) -> pa.Table:
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "n": pa.array([m[3] for m in merges], pa.int64()),
    })


# ----------------------------------------------------------------------
# application
# ----------------------------------------------------------------------


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> tuple:
    """Greedy lowest-rank-first merge application (the standard BPE
    encoder): repeatedly merge the pair with the best (lowest) rank
    until no learned pair remains."""
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        ranked = [(ranks[p], j) for j, p in enumerate(zip(sym, sym[1:]))
                  if p in ranks]
        if not ranked:
            break
        _, j = min(ranked)
        sym = _merge_word(sym, (sym[j], sym[j + 1]))
    return sym


class BpeEncode:
    """Actor-pool stage: per-doc subword statistics under a broadcast
    merge table.  ``__init__`` resolves the ``ray.put`` ref and builds
    the rank dict ONCE per actor; ``__call__`` encodes each batch's
    UNIQUE words through a persistent per-actor cache (vocab-bounded —
    across a long-lived actor the cache converges to the corpus
    vocabulary and encoding becomes a lookup)."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import re

        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {(left, right): rank
                      for rank, left, right, _n in merges}
        self.text_col = text_col
        self.word_re = re.compile(r"[a-z0-9]+")
        self.cache: Dict[str, int] = {}

    def __call__(self, batch):
        import pandas as pd

        # positional index contract: flat.index must offset into n_sub
        # (upstream pandas blocks can carry a filtered index)
        batch = batch.reset_index(drop=True)
        texts = batch[self.text_col].fillna("").str.lower()
        words = texts.str.findall(self.word_re)
        n_words = words.str.len().to_numpy(dtype=np.int64)
        flat = words.explode().dropna()
        n_sub = np.zeros(len(batch), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat.to_numpy(), return_inverse=True)
            lens = np.empty(len(uniq), dtype=np.int64)
            for k, w in enumerate(uniq):
                n = self.cache.get(w)
                if n is None:
                    n = len(encode_word(w, self.ranks))
                    self.cache[w] = n
                lens[k] = n
            np.add.at(n_sub, flat.index.to_numpy(), lens[inv])
        out = pd.DataFrame({c: batch[c].to_numpy()
                            for c in batch.columns if c != self.text_col})
        out["n_words"] = n_words
        out["n_subwords"] = n_sub
        return out


def bpe_doc_stats(ds, merges, text_col: str = "text",
                  concurrency=(1, 8)):
    """(doc_id, n_words, n_subwords) via the broadcast-merges actor
    stage."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(BpeEncode, fn_constructor_args=(ref, text_col),
                          batch_format="pandas", concurrency=concurrency)


# ----------------------------------------------------------------------
# tokenizer artifact persistence
# ----------------------------------------------------------------------


def save_merges(merges, path: str) -> str:
    """Write the merge table as a single parquet artifact (atomic
    rename) — the tokenizer is trained once and shipped to every later
    job; parquet keeps it engine-neutral and diffable."""
    import os

    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(merges_table(merges), tmp)
    os.replace(tmp, path)
    return path


def load_merges(path: str):
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    return list(zip(t["rank"].to_pylist(), t["left"].to_pylist(),
                    t["right"].to_pylist(), t["n"].to_pylist()))
