"""Streaming per-column statistics + distribution capture (SURVEY.md §2.4).

Pattern: per-batch PARTIAL aggregates inside ``map_batches`` (one tiny row
per batch), then a driver-side merge of the partials — a tree-reduce without
an all-to-all shuffle.  For grouped stats the partials carry one row per
(batch × key) and merge through a small ``groupby(key)``; a skewed key
(``source`` is 90% "web") therefore costs nothing: the shuffle moves
pre-aggregated sketch rows, not data rows.

Per column: count, null count, min, max, mean (numeric), distinct estimate
(HyperLogLog partial, merged associatively).  Token-length histograms feed
the drift checks in :mod:`xema_ray.stages.checks`.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.sketches import Histogram, HyperLogLog, hash_strings


def _batch_column_partial(col: pa.ChunkedArray, hll_p: int) -> dict:
    n = len(col)
    nulls = col.null_count
    out = {
        "count": n,
        "nulls": nulls,
        "min": None,
        "max": None,
        "sum": None,
        "hll": None,
    }
    t = col.type
    nn = col.drop_null()
    if len(nn) == 0:
        return out
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        mm = pc.min_max(nn).as_py()
        out["min"], out["max"] = mm["min"], mm["max"]
        out["sum"] = pc.sum(nn).as_py()
        h = HyperLogLog(hll_p)
        vals = nn.combine_chunks().to_numpy(zero_copy_only=False)
        from xema_ray.functions.sketches import splitmix64
        if np.issubdtype(vals.dtype, np.floating):
            # hash the float BITS — truncating to int64 collapsed all
            # fractional values sharing an integer part (code-review r2)
            bits = vals.astype(np.float64).view(np.uint64)
        else:
            bits = vals.astype(np.int64).view(np.uint64)
        h.add_hashes(splitmix64(bits))
        out["hll"] = h.to_bytes()
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(nn).as_py()
        out["min"], out["max"] = mm["min"], mm["max"]
        h = HyperLogLog(hll_p)
        h.add_hashes(hash_strings(nn.to_pylist()))
        out["hll"] = h.to_bytes()
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        lengths = pc.list_value_length(nn)
        mm = pc.min_max(lengths).as_py()
        out["min"], out["max"] = mm["min"], mm["max"]
        out["sum"] = pc.sum(lengths).as_py()
    return out


class _StatsPartials:
    """map_batches fn: one partial-stats row per (batch, column)."""

    def __init__(self, columns, hll_p: int = 14):
        self.columns = columns
        self.hll_p = hll_p

    def __call__(self, tbl: pa.Table) -> pa.Table:
        rows = {"column": [], "count": [], "nulls": [], "min": [], "max": [],
                "sum": [], "hll": []}
        for c in self.columns:
            if c not in tbl.column_names:
                continue
            p = _batch_column_partial(tbl[c], self.hll_p)
            rows["column"].append(c)
            rows["count"].append(p["count"])
            rows["nulls"].append(p["nulls"])
            rows["min"].append(json.dumps(p["min"]))
            rows["max"].append(json.dumps(p["max"]))
            rows["sum"].append(None if p["sum"] is None else float(p["sum"]))
            rows["hll"].append(p["hll"])
        return pa.table({
            "column": pa.array(rows["column"], type=pa.string()),
            "count": pa.array(rows["count"], type=pa.int64()),
            "nulls": pa.array(rows["nulls"], type=pa.int64()),
            "min": pa.array(rows["min"], type=pa.string()),
            "max": pa.array(rows["max"], type=pa.string()),
            "sum": pa.array(rows["sum"], type=pa.float64()),
            "hll": pa.array(rows["hll"], type=pa.binary()),
        })


def _merge_stats_block(tbl: pa.Table) -> pa.Table:
    """Associative in-block fold of partial-stats rows: one surviving row
    per column (the tree-reduce combiner — counts/sums add, min/max fold,
    HLL bytes OR-merge)."""
    agg: dict = {}
    for row in tbl.to_pylist():
        c = row["column"]
        s = agg.setdefault(c, {"count": 0, "nulls": 0, "min": None,
                               "max": None, "sum": None, "hll": None})
        s["count"] += row["count"]
        s["nulls"] += row["nulls"]
        mn, mx = json.loads(row["min"]), json.loads(row["max"])
        if mn is not None:
            s["min"] = mn if s["min"] is None else min(s["min"], mn)
        if mx is not None:
            s["max"] = mx if s["max"] is None else max(s["max"], mx)
        if row["sum"] is not None:
            s["sum"] = row["sum"] + (s["sum"] or 0.0)
        if row["hll"] is not None:
            h = HyperLogLog.from_bytes(row["hll"])
            if s["hll"] is None:
                s["hll"] = h
            else:
                s["hll"].merge(h)
    cols = sorted(agg)
    return pa.table({
        "column": pa.array(cols, type=pa.string()),
        "count": pa.array([agg[c]["count"] for c in cols], type=pa.int64()),
        "nulls": pa.array([agg[c]["nulls"] for c in cols], type=pa.int64()),
        "min": pa.array([json.dumps(agg[c]["min"]) for c in cols], type=pa.string()),
        "max": pa.array([json.dumps(agg[c]["max"]) for c in cols], type=pa.string()),
        "sum": pa.array([agg[c]["sum"] for c in cols], type=pa.float64()),
        "hll": pa.array([None if agg[c]["hll"] is None else agg[c]["hll"].to_bytes()
                         for c in cols], type=pa.binary()),
    })


def column_stats(ds, columns: Optional[list] = None, hll_p: int = 14,
                 strategy: str = "auto",
                 tree_threshold: int = 65536) -> dict:
    """Full-corpus per-column stats in one streaming pass.

    Returns ``{column: {count, nulls, null_rate, min, max, mean, distinct}}``.
    ``strategy='driver'`` merges one tiny partial row per (batch × column)
    on the driver — right for single-node block counts.  ``'tree'`` first
    folds partials INSIDE ~2·cpus repartitioned blocks (associative
    combiner, distributed), so the driver sees a bounded row count — the
    cluster path: at 10^6+ blocks the driver merge is a many-million-row
    single-threaded reduce dragging a 16 KB HLL per row (r1 verdict).
    ``'auto'`` picks tree above ``tree_threshold`` partial rows.
    """
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    partials_ds = ds.map_batches(
        _StatsPartials(columns, hll_p), batch_format="pyarrow"
    )
    if strategy == "auto":
        partials_ds = partials_ds.materialize()
        strategy = "driver" if partials_ds.count() <= tree_threshold else "tree"
    if strategy == "tree":
        import ray

        fanin = max(2, int(ray.cluster_resources().get("CPU", 8)) * 2)
        partials_ds = partials_ds.repartition(fanin).map_batches(
            lambda t: _merge_stats_block(t), batch_format="pyarrow")
    partials = partials_ds.take_all()

    out: dict = {}
    hlls: dict = {}
    for row in partials:
        c = row["column"]
        s = out.setdefault(c, {"count": 0, "nulls": 0, "min": None, "max": None, "sum": 0.0, "has_sum": False})
        s["count"] += row["count"]
        s["nulls"] += row["nulls"]
        mn, mx = json.loads(row["min"]), json.loads(row["max"])
        if mn is not None:
            s["min"] = mn if s["min"] is None else min(s["min"], mn)
        if mx is not None:
            s["max"] = mx if s["max"] is None else max(s["max"], mx)
        if row["sum"] is not None:
            s["sum"] += row["sum"]
            s["has_sum"] = True
        if row["hll"] is not None:
            h = HyperLogLog.from_bytes(row["hll"])
            if c in hlls:
                hlls[c].merge(h)
            else:
                hlls[c] = h
    result = {}
    for c, s in out.items():
        non_null = s["count"] - s["nulls"]
        result[c] = {
            "count": s["count"],
            "nulls": s["nulls"],
            "null_rate": s["nulls"] / s["count"] if s["count"] else 0.0,
            "min": s["min"],
            "max": s["max"],
            "mean": (s["sum"] / non_null) if (s["has_sum"] and non_null) else None,
            "distinct": round(hlls[c].estimate()) if c in hlls else None,
        }
    return result


# ----------------------------------------------------------------------
# grouped token-length histograms (drift input)
# ----------------------------------------------------------------------


class _GroupedHistPartials:
    """Per-batch: one (key, counts[]) histogram-partial row per key value."""

    def __init__(self, key: str, list_col: str, edges: np.ndarray):
        self.key = key
        self.list_col = list_col
        self.edges = edges

    def __call__(self, tbl: pa.Table) -> pa.Table:
        key = tbl[self.key]
        lengths = pc.list_value_length(tbl[self.list_col])
        mask = pc.and_(pc.is_valid(key), pc.is_valid(lengths))
        keep = tbl.filter(mask)
        if keep.num_rows == 0:
            return pa.table({
                "key": pa.array([], type=pa.string()),
                "counts": pa.array([], type=pa.list_(pa.int64())),
                "n": pa.array([], type=pa.int64()),
            })
        k = keep[self.key].combine_chunks()
        ln = pc.list_value_length(keep[self.list_col]).combine_chunks().to_numpy(zero_copy_only=False)
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        keys_out, counts_out, n_out = [], [], []
        for ci, name in enumerate(uniq):
            sel = ln[codes == ci]
            c, _ = np.histogram(sel, bins=self.edges)
            keys_out.append(name)
            counts_out.append(c.tolist())
            n_out.append(int(len(sel)))
        return pa.table({
            "key": pa.array(keys_out, type=pa.string()),
            "counts": pa.array(counts_out, type=pa.list_(pa.int64())),
            "n": pa.array(n_out, type=pa.int64()),
        })


def _merge_hist_block(tbl: pa.Table) -> pa.Table:
    """In-block fold of histogram-partial rows (tree-reduce combiner)."""
    agg: dict = {}
    ns: dict = {}
    for row in tbl.to_pylist():
        c = np.asarray(row["counts"], dtype=np.int64)
        if row["key"] in agg:
            agg[row["key"]] += c
        else:
            agg[row["key"]] = c
        ns[row["key"]] = ns.get(row["key"], 0) + row["n"]
    keys = sorted(agg)
    return pa.table({
        "key": pa.array(keys, type=pa.string()),
        "counts": pa.array([agg[k].tolist() for k in keys],
                           type=pa.list_(pa.int64())),
        "n": pa.array([ns[k] for k in keys], type=pa.int64()),
    })


def grouped_length_histograms(
    ds, key: str = "source", list_col: str = "tokens",
    edges: Optional[np.ndarray] = None, strategy: str = "auto",
    tree_threshold: int = 65536,
) -> dict:
    """Token-length histogram per ``key`` value → ``{key: Histogram}``.

    Pre-aggregated per batch (partials); above ``tree_threshold`` partial
    rows an in-block associative fold runs distributed first (the cluster
    path — same rationale as :func:`column_stats`).
    """
    if edges is None:
        edges = Histogram.log_bins().edges
    partials_ds = ds.map_batches(
        _GroupedHistPartials(key, list_col, edges), batch_format="pyarrow"
    )
    if strategy == "auto":
        partials_ds = partials_ds.materialize()
        strategy = "driver" if partials_ds.count() <= tree_threshold else "tree"
    if strategy == "tree":
        import ray

        fanin = max(2, int(ray.cluster_resources().get("CPU", 8)) * 2)
        partials_ds = partials_ds.repartition(fanin).map_batches(
            lambda t: _merge_hist_block(t), batch_format="pyarrow")
    merged: dict = {}
    for row in partials_ds.take_all():
        h = merged.setdefault(row["key"], Histogram(edges))
        h.counts += np.asarray(row["counts"], dtype=np.int64)
    return merged


# ----------------------------------------------------------------------
# token frequencies (bounded-vocabulary heavy hitters)
# ----------------------------------------------------------------------


def token_frequencies(ds, list_col: str = "tokens", vocab: int = 50257,
                      strategy: str = "auto", tree_threshold: int = 4096):
    """EXACT per-token frequencies over a bounded vocabulary.

    Per batch: one ``np.bincount`` over the flattened token values → a
    single (vocab,)-int64 partial row (~400 KB at GPT-2 vocab).  Partials
    merge by vector add — associative, so the same driver/tree strategies
    as :func:`column_stats` apply.  Exact at ANY corpus size (the partial
    size is bounded by the vocabulary, not the data), which is why no
    count-min sketch is needed for heavy hitters here; an unbounded
    domain would use CMS + candidate verification instead.
    Returns the (vocab,) count vector.
    """
    def _pack(counts: np.ndarray) -> pa.Table:
        # one (vocab,) row, built zero-copy from the numpy buffer —
        # counts.tolist() would allocate `vocab` Python ints per partial
        return pa.table({"counts": pa.ListArray.from_arrays(
            pa.array([0, vocab], type=pa.int32()),
            pa.array(counts, type=pa.int64()))})

    def _unpack_sum(tbl: pa.Table) -> np.ndarray:
        # concatenated list values → (n, vocab) view → column sums; never
        # leaves numpy (take_all here cost 12.9M Python ints at sf0.1)
        col = tbl["counts"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        return vals.reshape(-1, vocab).sum(axis=0)

    def partial(tbl: pa.Table) -> pa.Table:
        col = tbl[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values.drop_null() if col.null_count or col.values.null_count \
            else col.values
        v = values.to_numpy(zero_copy_only=False)
        # keep the native (int32) dtype — astype(int64) would copy ~2x the
        # token volume per batch; bincount accepts any int dtype
        mask = (v >= 0) & (v < vocab)
        if not mask.all():
            v = v[mask]
        return _pack(np.bincount(v, minlength=vocab))

    # batch_size=None: one partial per BLOCK (not per 1024-row slice) —
    # bincount cost is linear in tokens either way, but 4x fewer partial
    # rows cross the merge
    partials_ds = ds.select_columns([list_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    if strategy == "auto":
        partials_ds = partials_ds.materialize()
        strategy = "driver" if partials_ds.count() <= tree_threshold else "tree"
    if strategy == "tree":
        import ray

        fanin = max(2, int(ray.cluster_resources().get("CPU", 8)) * 2)

        def fold(t: pa.Table) -> pa.Table:
            return _pack(_unpack_sum(t))

        partials_ds = partials_ds.repartition(fanin).map_batches(
            fold, batch_format="pyarrow", batch_size=None)
    total = np.zeros(vocab, dtype=np.int64)
    for b in partials_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        total += _unpack_sum(b)
    return total


def top_tokens(ds, k: int = 20, list_col: str = "tokens",
               vocab: int = 50257, **kw) -> pa.Table:
    """Top-k most frequent tokens (count desc, token asc tie-break)."""
    counts = token_frequencies(ds, list_col=list_col, vocab=vocab, **kw)
    order = np.lexsort((np.arange(vocab), -counts))[:k]
    return pa.table({
        "tok": pa.array(order.astype(np.int64), type=pa.int64()),
        "n": pa.array(counts[order], type=pa.int64()),
    })


# ----------------------------------------------------------------------
# heavy hitters over an UNBOUNDED key space (r3): Misra-Gries sketch
# partials + exact candidate recount — the two-pass exact top-k that
# works when the vocabulary doesn't fit a bincount (word tokens, URLs,
# user ids).  Misra & Gries 1982 / the "space-saving" family; the merge
# (sum counters, subtract the (k+1)-th largest, clip) preserves the
# deterministic guarantee count(x) >= true(x) - N/capacity, so every key
# with true count > N/capacity SURVIVES the sketch and the exact second
# pass makes the final top-k exact.
# ----------------------------------------------------------------------


def _mg_sketch_batch(words, capacity: int) -> dict:
    """Misra-Gries counters for one batch (plain dict, <= capacity keys)."""
    from collections import Counter

    c = Counter(words)  # exact within batch (C-speed), then shrink
    if len(c) > capacity:
        kth = sorted(c.values(), reverse=True)[capacity]
        c = Counter({k: v - kth for k, v in c.items() if v > kth})
    return dict(c)


def _mg_merge(a: dict, b: dict, capacity: int) -> dict:
    for k, v in b.items():
        a[k] = a.get(k, 0) + v
    if len(a) > capacity:
        kth = sorted(a.values(), reverse=True)[capacity]
        a = {k: v - kth for k, v in a.items() if v > kth}
    return a


def top_words_exact(ds, k: int = 20, capacity: int = 4096,
                    text_col: str = "text"):
    """Exact top-k words over an unbounded vocabulary, two passes:

    1. streaming Misra-Gries partials (one small dict per batch, merged
       associatively on the driver — O(capacity) state); the surviving
       counter keys are a SUPERSET of every word with true frequency
       > N/capacity, hence of the true top-k whenever the k-th count
       clears that bound (guaranteed here by capacity >> k);
    2. one column-pruned recount pass with the candidate set broadcast —
       exact counts for candidates only, then the true top-k.

    Returns a pyarrow Table (word, n) sorted by (-n, word).
    """
    import pickle
    import re

    import ray

    word_re = re.compile(r"[a-z0-9]+")

    def partial(t: pa.Table) -> pa.Table:
        import re as _re

        wre = _re.compile(r"[a-z0-9]+")
        words = []
        for txt in t[text_col].to_pylist():
            if txt:
                words.extend(wre.findall(txt.lower()))
        sk = _mg_sketch_batch(words, capacity)
        return pa.table({"blob": pa.array([pickle.dumps(sk)],
                                          type=pa.binary())})

    merged: dict = {}
    for b in ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for blob in b["blob"].to_pylist():
            merged = _mg_merge(merged, pickle.loads(blob), capacity)
    cand = sorted(merged)  # candidate words (superset of true top-k)
    cand_ref = ray.put(set(cand))

    def recount(t: pa.Table) -> pa.Table:
        from collections import Counter

        cs = ray.get(cand_ref)
        c = Counter()
        for txt in t[text_col].to_pylist():
            if txt:
                for w in word_re.findall(txt.lower()):
                    if w in cs:
                        c[w] += 1
        return pa.table({
            "word": pa.array(list(c.keys()), type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64()),
        })

    from collections import Counter

    total = Counter()
    for b in ds.select_columns([text_col]).map_batches(
            recount, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
            total[w] += n
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "word": pa.array([w for w, _ in top], type=pa.string()),
        "n": pa.array([n for _, n in top], type=pa.int64()),
    })


def label_centroid_sums(ds, vec_col: str = "embedding",
                        label_col: str = "label", scale: float = 1e6):
    """Per-label embedding centroid aggregate: one output row per
    ``(label, dim)`` with the FIXED-POINT element sum ``s_m =
    Σ floor(scale·v)`` (int64 — order-free, so cross-engine hash-stable
    where a float mean is not) and the contributing row count ``n``.
    ``centroid ≈ s_m / (scale·n)``.

    Shape: per-batch dense scatter-add partials (labels × dims ints —
    the only thing leaving workers), folded on the driver; the output is
    O(|labels|·dims) by definition, so the fold is always tiny.  float32
    → float64 is exact, and ``floor(scale·x)`` is one IEEE double op —
    both reproducible bit-for-bit by an independent SQL engine.
    """
    def partial(t: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(t[vec_col]), pc.is_valid(t[label_col]))
        t = t.filter(valid)
        if not t.num_rows:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "s_m": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        vec = t[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        offsets = vec.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = vec.values.to_numpy(zero_copy_only=False)
        fixed = np.floor(flat.astype(np.float64) * scale).astype(np.int64)
        dims = np.diff(offsets)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), dims)
        dim_idx = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(offsets[:-1], dims)
        labels = pc.cast(t[label_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        uniq, codes = np.unique(labels, return_inverse=True)
        max_dim = int(dims.max()) if len(dims) else 0
        key = codes[rows] * max_dim + dim_idx
        sums = np.zeros(len(uniq) * max_dim, dtype=np.int64)
        cnts = np.zeros(len(uniq) * max_dim, dtype=np.int64)
        np.add.at(sums, key, fixed)
        np.add.at(cnts, key, 1)
        nz = cnts > 0
        idx = np.flatnonzero(nz)
        return pa.table({
            "label": pa.array(uniq[idx // max_dim], type=pa.int64()),
            "dim": pa.array(idx % max_dim + 1, type=pa.int64()),  # 1-based
            "s_m": pa.array(sums[idx], type=pa.int64()),
            "n": pa.array(cnts[idx], type=pa.int64()),
        })

    import pandas as pd

    frames = [b.to_pandas() for b in
              ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")]
    if not frames:
        return pa.table({"label": pa.array([], type=pa.int64()),
                         "dim": pa.array([], type=pa.int64()),
                         "s_m": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["label", "dim"], sort=True, as_index=False).sum()
    return pa.Table.from_pandas(out[["label", "dim", "s_m", "n"]],
                                preserve_index=False)


_PAIR_BIAS = np.uint64(1 << 31)


def _pair_keys_batch(t: pa.Table, list_col: str) -> np.ndarray:
    """Packed uint64 keys ``(t1+2³¹)<<32 | (t2+2³¹)`` of every ADJACENT
    token pair in the batch (row boundaries respected; null rows
    dropped).  INJECTIVE for any token values in [-2³¹, 2³¹) — a
    ``t1*vocab + t2`` pack would alias out-of-vocab tokens (which the
    corpus injects by design) onto unrelated bigrams (code-review r3,
    confirmed repro)."""
    col = t[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.is_valid(col)
    if not pc.all(valid).as_py():
        col = col.filter(valid)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) < 2:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        biased = flat.astype(np.uint64) + _PAIR_BIAS  # wraps int32 → [0, 2³²)
        biased &= np.uint64(0xFFFFFFFF)
        keys = (biased[:-1] << np.uint64(32)) | biased[1:]
    # drop positions where the NEXT element starts a new row;
    # offsets == len(flat) (trailing empty rows) touch no pair
    row_starts = np.zeros(len(flat), dtype=bool)
    starts = offsets[:-1]
    row_starts[starts[starts < len(flat)]] = True
    return keys[~row_starts[1:]]


def _unpack_pairs(keys: np.ndarray):
    """Inverse of :func:`_pair_keys_batch`: ``(t1, t2)`` int64 arrays."""
    t1 = (keys >> np.uint64(32)).astype(np.int64) - (1 << 31)
    t2 = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64) - (1 << 31)
    return t1, t2


def _mg_shrink_arrays(keys: np.ndarray, cnts: np.ndarray, capacity: int):
    """Vectorized Misra-Gries decrement: keep the ``capacity`` largest
    counters after subtracting the (capacity+1)-th largest (the array
    form of :func:`_mg_sketch_batch`'s dict shrink)."""
    if len(keys) <= capacity:
        return keys, cnts
    kth = np.partition(cnts, len(cnts) - capacity - 1)[
        len(cnts) - capacity - 1]
    c2 = cnts - kth
    m = c2 > 0
    return keys[m], c2[m]


def u64_key_exchange(block_refs, keys_fn, bucket_select,
                     n_buckets: int = None, task_parallelism: int = None):
    """Generic raw-task map-reduce over uint64 keys with PER-BUCKET
    objects — the worst-case exchange lane (r4, VERDICT item 6),
    shared by the bigram top-k and the duplicated-gram counting pass.

    Ray Data's sort-based groupby exchange costs O(total keys · log)
    through one sort pipeline (measured 131-152 s at sf0.1 / 175 M
    near-uniform pair keys).  The Dataset API genuinely can't express
    the cheap form — a pure hash exchange of fixed-width keys — so
    this drops to raw Ray tasks (the sanctioned last resort):

    * ``T ≈ cpus/4`` map tasks, each walking several input blocks
      sequentially: ``keys_fn(block) -> uint64 array``, then an O(n)
      chunked counting-sort split by ``key % B`` into ``B`` bucket
      shards returned as SEPARATE objects (``num_returns=B``) — at
      cluster scale a reducer pulls only its own bucket's bytes
      (8 B/key), never whole blocks;
    * ``T`` reduce tasks, each folding ``B/T`` buckets sequentially:
      concat + sort + run-length diff, then ``bucket_select(uk, cnts)``
      cuts the bucket's survivors (top-k, count threshold, ...);
    * driver: concatenates the per-bucket survivors.

    Task shape is deliberately COARSE (``cpus/4`` single-threaded
    tasks, several blocks/buckets each): random-key sorting saturates
    a node's memory bandwidth well below one task per core, and
    concurrent first-touch page faulting across fresh worker heaps is
    superlinear — measured cold wall 13.7 s at 8 concurrent tasks vs
    56 s at 16 and ~90 s at 32 on the same 32-core host; sequential
    blocks inside one task reuse the already-faulted arena.  Memory
    per reduce fold is bounded by distinct-keys/B; every key lives in
    exactly one bucket, so per-bucket cuts against bucket-local counts
    are globally sound (the counts per key ARE global).
    Returns ``(keys, counts)`` uint64/int64 arrays."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    if task_parallelism is None:
        task_parallelism = max(2, cpus // 4)
    if not block_refs:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    nt = min(task_parallelism, len(block_refs))
    if n_buckets is None:
        # a small sequential fan-in of buckets per reduce task bounds
        # fold memory at distinct/B while keeping task count at T
        n_buckets = 4 * nt
    nb = max(2, n_buckets)  # num_returns>=2 keeps the shard API uniform
    _SPLIT_CHUNK = 1 << 18  # 256k keys ≈ 2 MB temporaries: arena-reusable

    def map_group(*tbls):
        # NO map-side pre-reduce on purpose: this lane exists for the
        # near-uniform worst case where per-batch keys barely repeat,
        # so a per-batch sort-unique costs 5x the O(n) counting-sort
        # split and saves nothing (skewed inputs certify in the MG lane
        # and never reach here).  Raw keys are 8 B each — LESS than the
        # 12 B (key, cnt) a pre-reduced shard would ship when counts
        # are ~1.
        from xema_ray.stages.shuffle import tune_malloc

        tune_malloc()
        outs = [[] for _ in range(nb)]
        for tbl in tbls:
            keys = keys_fn(tbl)
            for s0 in range(0, len(keys), _SPLIT_CHUNK):
                kc = keys[s0:s0 + _SPLIT_CHUNK]
                b = (kc % np.uint64(nb)).astype(np.int32)
                order = np.argsort(b, kind="stable")
                ks = kc[order]
                offs = np.concatenate(
                    [[0], np.cumsum(np.bincount(b, minlength=nb))])
                for i in range(nb):
                    outs[i].append(ks[offs[i]:offs[i + 1]])
        return tuple(np.concatenate(o) if o else np.empty(0, np.uint64)
                     for o in outs)

    def reduce_group(n_per_bucket, *parts):
        # parts = n_per_bucket shards for bucket 0, then bucket 1, ...
        from xema_ray.stages.shuffle import tune_malloc

        tune_malloc()
        out = []
        for i in range(0, len(parts), n_per_bucket):
            ks = [p for p in parts[i:i + n_per_bucket] if len(p)]
            if not ks:
                out.append((np.empty(0, np.uint64),
                            np.empty(0, np.int64)))
                continue
            # sort + run-length diff: ~3.5x cheaper than np.unique's
            # return_counts path on random 64-bit keys
            s = np.sort(np.concatenate(ks))
            m = np.empty(len(s), bool)
            m[0] = True
            np.not_equal(s[1:], s[:-1], out=m[1:])
            uk = s[m]
            cnts = np.diff(np.append(np.flatnonzero(m), len(s)))
            out.append(bucket_select(uk, cnts.astype(np.int64)))
        return out

    map_remote = ray.remote(num_returns=nb, num_cpus=1)(map_group)
    reduce_remote = ray.remote(num_cpus=1)(reduce_group)

    groups = [block_refs[i::nt] for i in range(nt)]
    shard_refs = [map_remote.remote(*g) for g in groups]
    bucket_sets = [list(range(nb))[j::nt] for j in range(nt)]
    futs = [reduce_remote.remote(
        len(shard_refs), *[s[b] for b in bs for s in shard_refs])
        for bs in bucket_sets if bs]
    tops = [t for chunk in ray.get(futs) for t in chunk]
    if not tops:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return (np.concatenate([t[0] for t in tops]),
            np.concatenate([t[1] for t in tops]))


def _bigram_exchange(ds, k: int, list_col: str, n_buckets: int = None,
                     task_parallelism: int = None):
    """Exact global top-``k`` bigrams through the shared raw-task
    u64-key exchange: per-bucket top-k cuts under the global
    (n desc, t1, t2) total order, driver merges B·k survivors."""
    def select(uk, cnts):
        order = np.lexsort((uk, -cnts))[:k]
        return uk[order], cnts[order]

    keys, ns = u64_key_exchange(
        ds.to_arrow_refs(),
        lambda tbl: _pair_keys_batch(tbl, list_col), select,
        n_buckets=n_buckets, task_parallelism=task_parallelism)
    order = np.lexsort((keys, -ns))[:k]
    t1, t2 = _unpack_pairs(keys[order])
    return pa.table({
        "t1": pa.array(t1, type=pa.int64()),
        "t2": pa.array(t2, type=pa.int64()),
        "n": pa.array(ns[order], type=pa.int64()),
    })


def top_token_bigrams(ds, k: int = 20, list_col: str = "tokens",
                      vocab: int = 50257, capacity: int = 1 << 18,
                      strategy: str = "auto"):
    """Exact global top-``k`` ADJACENT token bigrams over the vocab²
    key space.

    ``strategy="mg"`` (the scale path): two streaming passes, NO
    shuffle —

    1. per-batch ``np.unique`` counts shrunk to Misra-Gries partials
       (≤ ``capacity`` injectively-packed uint64 pair counters per
       batch — ``vocab`` is kept for API compatibility but no longer
       shapes the packing), folded on the driver with the same
       vectorized decrement.  Survivors are a superset of every pair
       with true count > N/capacity.
    2. candidates broadcast (``ray.put`` once) + one exact recount pass
       (searchsorted membership, bincount partials), then the true
       top-k.

    The result SELF-CERTIFIES: if the k-th recounted candidate count
    clears the N/capacity survival bound, the top-k is provably exact.
    ``"auto"`` runs mg and falls back to the exact ``"groupby"``
    bucket-partitioned merge on the (pathological) failure of that
    certificate — correctness never depends on the sketch.

    ``"exchange"`` (the exact worst-case lane, r4): raw-task map-reduce
    with per-bucket objects — exact unconditionally and O(distinct
    pairs / B) per reducer with no sort; see :func:`_bigram_exchange`.
    ``"auto"`` falls back to it (not to groupby) when the certificate
    fails, so the uniform worst case costs one extra streaming pass,
    never a sort exchange.

    ``"groupby"``: one coarse hash-bucket Ray-Data exchange of ALL
    per-batch (pair, cnt) partials — exact unconditionally, kept as
    the pure-Dataset-API reference lane, but its sort exchange is
    O(total pairs) when pairs are mostly batch-unique (measured 131 s
    vs 9.5 s for exchange at sf0.1 / 175 M pairs).  Ties break
    (n desc, t1 asc, t2 asc) everywhere — a total order, so the cut
    is deterministic across all four lanes.
    """
    import pandas as pd

    if strategy == "exchange":
        return _bigram_exchange(ds, k, list_col)

    if strategy in ("auto", "mg"):
        import ray

        def sketch(t: pa.Table) -> pa.Table:
            pairs = _pair_keys_batch(t, list_col)
            up, cnt = (np.unique(pairs, return_counts=True)
                       if len(pairs) else (np.empty(0, np.uint64),
                                           np.empty(0, np.int64)))
            uk, uc = _mg_shrink_arrays(up, cnt.astype(np.int64), capacity)
            # meta row (flagged, not a sentinel key — every uint64 is a
            # legal pair key): total pair count of this batch — must
            # survive even when the shrink empties the sketch, or the
            # certification bound undercounts N
            return pa.table({
                "pair": pa.array(np.concatenate(
                    [[np.uint64(0)], uk.astype(np.uint64)]),
                    type=pa.uint64()),
                "cnt": pa.array(np.concatenate([[len(pairs)], uc]),
                                type=pa.int64()),
                "meta": pa.array(
                    np.concatenate([[True], np.zeros(len(uk), bool)]),
                    type=pa.bool_()),
            })

        mk = np.empty(0, dtype=np.uint64)
        mc = np.empty(0, dtype=np.int64)
        n_total = 0
        for b in ds.map_batches(sketch, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            bk = b["pair"].to_numpy(zero_copy_only=False)
            bc = b["cnt"].to_numpy(zero_copy_only=False)
            meta = b["meta"].to_numpy(zero_copy_only=False)
            n_total += int(bc[meta].sum())
            mk = np.concatenate([mk, bk[~meta]])
            mc = np.concatenate([mc, bc[~meta]])
            if len(mk) > 4 * capacity:
                uk, inv = np.unique(mk, return_inverse=True)
                us = np.zeros(len(uk), np.int64)
                np.add.at(us, inv, mc)
                mk, mc = _mg_shrink_arrays(uk, us, capacity)
        if len(mk):
            uk, inv = np.unique(mk, return_inverse=True)
            us = np.zeros(len(uk), np.int64)
            np.add.at(us, inv, mc)
            mk, mc = _mg_shrink_arrays(uk, us, capacity)
        cand = np.sort(mk)
        cand_ref = ray.put(cand)

        def recount(t: pa.Table) -> pa.Table:
            cs = ray.get(cand_ref)
            pairs = _pair_keys_batch(t, list_col)
            if not len(pairs) or not len(cs):
                return pa.table({"idx": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            pos = np.searchsorted(cs, pairs)
            pos = np.minimum(pos, len(cs) - 1)
            hit = cs[pos] == pairs
            cnts = np.bincount(pos[hit], minlength=len(cs))
            nz = np.flatnonzero(cnts)
            return pa.table({"idx": pa.array(nz, type=pa.int64()),
                             "n": pa.array(cnts[nz], type=pa.int64())})

        totals = np.zeros(len(cand), dtype=np.int64)
        for b in ds.map_batches(recount, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                totals[b["idx"].to_numpy(zero_copy_only=False)] += \
                    b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cand, -totals))[:k]
        topk_counts = totals[order]
        # sound certificate: every pair with true count > N/capacity is
        # a candidate, so the exact top-k is proven once the k-th
        # candidate count clears that survival bound
        certified = n_total == 0 or (
            len(topk_counts) == min(k, len(cand))
            and len(topk_counts) == k
            and topk_counts[-1] * capacity > n_total)
        if certified or strategy == "mg":
            sel_t1, sel_t2 = _unpack_pairs(cand[order])
            return pa.table({
                "t1": pa.array(sel_t1, type=pa.int64()),
                "t2": pa.array(sel_t2, type=pa.int64()),
                "n": pa.array(topk_counts, type=pa.int64()),
            })
        # certificate failed under "auto": exact raw-task exchange
        return _bigram_exchange(ds, k, list_col)

    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        pairs = _pair_keys_batch(t, list_col)
        up, cnt = (np.unique(pairs, return_counts=True)
                   if len(pairs) else (np.empty(0, np.uint64),
                                       np.empty(0, np.int64)))
        # per-batch counts fit int32 — 12 bytes of payload per row
        # through the shuffle (uint64 key + int32 count)
        return pa.table({
            "pair": pa.array(up.astype(np.uint64), type=pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int32), type=pa.int32()),
            "bucket": pa.array((up % np.uint64(n_buckets))
                               .astype(np.int32), type=pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        p = g["pair"].to_numpy().astype(np.uint64)
        uniq, inv = np.unique(p, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, g["cnt"].to_numpy(dtype=np.int64))
        order = np.lexsort((uniq, -sums))[:k]
        return pd.DataFrame({"pair": uniq[order], "n": sums[order]})

    cand = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_topk, batch_format="pandas") \
        .take_all()  # ≤ B·k rows
    if not cand:
        return pa.table({"t1": pa.array([], type=pa.int64()),
                         "t2": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    pairs = np.array([r["pair"] for r in cand], dtype=np.uint64)
    ns = np.array([r["n"] for r in cand], dtype=np.int64)
    order = np.lexsort((pairs, -ns))[:k]
    t1, t2 = _unpack_pairs(pairs[order])
    return pa.table({
        "t1": pa.array(t1, type=pa.int64()),
        "t2": pa.array(t2, type=pa.int64()),
        "n": pa.array(ns[order], type=pa.int64()),
    })


def grouped_zscore_outliers(ds, key: str = "source", col: str = "n_tok",
                            z: int = 3, id_col: str = "doc_id"):
    """EXACT z-score outlier rows per group with pure-integer
    arithmetic: a row is an outlier when |x − μ_g| > z·σ_g, evaluated
    as the equivalent integer test ``|x·n − Σx| > isqrt(z²·var_num)``
    where ``var_num = n·Σx² − (Σx)² = n²·σ²`` — no float ever enters,
    so the decision is bit-identical on any engine (the SQL twin
    compares the squared form in HUGEINT).

    Two passes: (1) per-batch integer partials (n, Σx, Σx²) merged per
    group — a |groups|-row exchange; (2) the driver turns each group's
    variance into an integer threshold with ``math.isqrt`` (exact for
    arbitrary ints, unlike float sqrt) and broadcasts the tiny
    (n, Σx, t) table into a streaming filter pass.  Skew-free: data
    rows never shuffle.
    """
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key]), pc.is_valid(t[col])))
        x = pc.cast(t[col], pa.int64())
        return pa.table({
            key: t[key], "x": x, "sq": pc.multiply(x, x),
        }).group_by(key).aggregate(
            [("x", "count"), ("x", "sum"), ("sq", "sum")])

    stats = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(
            Sum("x_count", alias_name="n"),
            Sum("x_sum", alias_name="sm"),
            Sum("sq_sum", alias_name="ssq"),
        ).take_all()
    # exact integer thresholds (Python ints — no overflow, no rounding)
    bounds = {}
    for r in stats:
        n, sm, ssq = int(r["n"]), int(r["sm"]), int(r["ssq"])
        var_num = n * ssq - sm * sm
        bounds[r[key]] = (n, sm, math.isqrt(z * z * var_num))

    keys = list(bounds)
    key_set = pa.array(keys)
    n_arr = np.array([bounds[s][0] for s in keys], dtype=np.int64)
    sm_arr = np.array([bounds[s][1] for s in keys], dtype=np.int64)
    t_arr = np.array([bounds[s][2] for s in keys], dtype=np.int64)

    def flag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key]), pc.is_valid(t[col])))
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.string()),
                             key: pa.array([], type=pa.string()),
                             col: pa.array([], type=pa.int64())})
        gi = pc.index_in(t[key], value_set=key_set) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        x = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
        d = np.abs(x * n_arr[gi] - sm_arr[gi])
        m = d > t_arr[gi]
        out = t.filter(pa.array(m))
        return pa.table({
            id_col: pc.fill_null(pc.cast(out[id_col], pa.string()), ""),
            key: out[key],
            col: pc.cast(out[col], pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def key_skew_report(ds, key: str = "user_id", k: int = 15,
                    capacity: int = 4096):
    """Hot-key diagnostic for shuffle planning: exact top-k keys by row
    count plus their traffic share, over an UNBOUNDED integer key space.

    The operator every 100-TB shuffle wants run first: a key that owns
    x% of the rows owns x% of one reducer's input in any hash exchange
    (the skew that motivates the engine's salting / time-bucket paths).
    Same two-pass shape as :func:`top_words_exact` but fully vectorized
    for int64 keys: per-batch ``np.unique`` counts shrunk to
    Misra-Gries arrays (O(capacity) driver state; survivors are a
    superset of every key with share > 1/capacity), then one
    broadcast-candidate searchsorted recount for exact counts and the
    exact total.  Returns (rank, <key>, n, share_ppm) with
    ``share_ppm = n * 10^6 // total`` — integer, hash-stable.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        col = t[key]
        col = col.filter(pc.is_valid(col)) if col.null_count else col
        v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        keys, cnts = np.unique(v, return_counts=True)
        keys, cnts = _mg_shrink_arrays(keys, cnts.astype(np.int64),
                                       capacity)
        # batch total rides in a FLAGGED meta row (the top_token_bigrams
        # contract): it must survive even when the shrink empties the
        # sketch (all counts tied, distinct > capacity), or `total`
        # undercounts and the certification bound falsely certifies
        return pa.table({
            "k": pa.array(np.concatenate([[0], keys]), pa.int64()),
            "c": pa.array(np.concatenate([[len(v)], cnts]), pa.int64()),
            "meta": pa.array(np.concatenate([[True], np.zeros(len(keys), bool)]),
                             pa.bool_()),
        })

    mk = np.array([], np.int64)
    mc = np.array([], np.int64)
    total = 0
    for b in ds.select_columns([key]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if not b.num_rows:
            continue
        bk = b["k"].to_numpy(zero_copy_only=False)
        bc = b["c"].to_numpy(zero_copy_only=False)
        meta = b["meta"].to_numpy(zero_copy_only=False)
        total += int(bc[meta].sum())
        if not (~meta).any():
            continue
        cat_k = np.concatenate([mk, bk[~meta]])
        cat_c = np.concatenate([mc, bc[~meta]])
        mk, inv = np.unique(cat_k, return_inverse=True)
        mc = np.zeros(len(mk), np.int64)
        np.add.at(mc, inv, cat_c)
        mk, mc = _mg_shrink_arrays(mk, mc, capacity)
    cand_ref = ray.put(np.sort(mk))

    def recount(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        col = t[key]
        col = col.filter(pc.is_valid(col)) if col.null_count else col
        v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand, v)
        pos_c = np.clip(pos, 0, len(cand) - 1)
        hit = (len(cand) > 0) & (cand[pos_c] == v) if len(cand) else \
            np.zeros(len(v), bool)
        cnt = np.bincount(pos_c[hit], minlength=len(cand)) \
            .astype(np.int64) if len(cand) else np.zeros(0, np.int64)
        return pa.table({"i": pa.array(np.arange(len(cand), dtype=np.int64)),
                         "c": pa.array(cnt)})

    exact = np.zeros(len(mk), np.int64)
    for b in ds.select_columns([key]).map_batches(
            recount, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        np.add.at(exact, b["i"].to_numpy(zero_copy_only=False),
                  b["c"].to_numpy(zero_copy_only=False))
    cand = np.sort(mk)
    order = np.lexsort((cand, -exact))[:k]
    n = exact[order]
    # self-certification (the top_token_bigrams contract): the merged
    # MG sketch undercounts by at most total/capacity, so candidates
    # cover every key with true count above that bound — if the k-th
    # recounted candidate clears it, the top-k is provably complete.
    # The coverage certificate applies in EITHER branch: when the
    # candidates' recounts sum to the corpus total, no key exists
    # outside the candidate set, so the cut is exact regardless of the
    # bound (code-review r4: a skewed corpus with < capacity distinct
    # keys must not refuse just because the k-th count is small).
    # With FEWER than k candidates the bound alone can never certify:
    # unseen keys with count <= total/capacity could belong in the
    # report (the fully uniform corpus lands here and must raise,
    # not return empty)
    covered = int(exact.sum()) == total
    certified = covered or (len(n) == k and n[-1] * capacity > total)
    if not certified:
        kth = int(n[-1]) if len(n) else 0
        raise ValueError(
            f"top-{k} not certified: k-th count {kth} <= "
            f"total/capacity {total}/{capacity}; raise capacity")
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        key: pa.array(cand[order], pa.int64()),
        "n": pa.array(n, pa.int64()),
        "share_ppm": pa.array(n * 1_000_000 // max(total, 1), pa.int64()),
    })
