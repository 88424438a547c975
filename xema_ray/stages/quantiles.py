"""Distributed EXACT quantiles — selection by bucket refinement, no
global sort.

``Dataset.sort`` is an all-to-all exchange of the whole column; an exact
k-th order statistic only needs *counts*.  The classic distributed
selection shape (Blum et al. selection generalized to partitions; the
same two-phase histogram trick DuckDB/BigQuery use for approx quantiles,
driven to exactness here):

1. **sample pass** — per-block sorted stride samples (a deterministic
   per-block quantile sketch, no RNG) merge on the driver into ``B``
   roughly-equal-mass boundary values.  Sample quality affects only
   balance, never correctness.
2. **count pass(es)** — per-batch ``np.searchsorted`` + ``bincount``
   against the boundaries; the driver sums the tiny ``B``-vectors and
   locates each target rank's bucket.  Oversized buckets are re-split
   *within their value range* and recounted (geometric range shrink);
   a bucket whose range collapses to one distinct value IS the answer
   for every rank inside it (point masses can't be subdivided and don't
   need to be).
3. **fetch pass** — only the rank-holding buckets (≤ ``fetch_cap`` rows
   each) are filtered out and sorted locally; the k-th element is read
   off by local rank.

Driver state is O(B + fetched buckets), never O(n).  Rank convention
matches DuckDB ``quantile_disc``: zero-based index
``max(ceil(q*n) - 1, 0)`` into the ascending sorted multiset (nulls and
NaNs excluded).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _valid_values(tbl: pa.Table, col: str) -> np.ndarray:
    a = tbl[col]
    if pa.types.is_floating(a.type):
        a = a.filter(pc.and_(pc.is_valid(a), pc.invert(pc.is_nan(a))))
    else:
        a = a.drop_null()
    return a.combine_chunks().to_numpy(zero_copy_only=False)


def _sample_pass(ds, col: str, per_block: int):
    """(total n, merged sorted sample) — sorted stride sample per block."""
    def fn(tbl: pa.Table) -> pa.Table:
        v = np.sort(_valid_values(tbl, col))
        nv = len(v)
        if nv > per_block:
            idx = np.linspace(0, nv - 1, per_block).round().astype(np.int64)
            v = v[idx]
        return pa.table({"n": pa.array([nv], type=pa.int64()),
                         "sample": pa.array([v.tolist()])})

    rows = ds.map_batches(fn, batch_format="pyarrow").take_all()
    n = int(sum(r["n"] for r in rows))
    parts = [np.asarray(r["sample"]) for r in rows if len(r["sample"])]
    samp = np.sort(np.concatenate(parts)) if parts else np.array([])
    return n, samp


def _count_pass(ds, col: str, edges: np.ndarray) -> np.ndarray:
    """Global histogram over ``len(edges)+1`` buckets; bucket j is the
    half-open value interval (edges[j-1], edges[j]]."""
    nb = len(edges) + 1

    def fn(tbl: pa.Table) -> pa.Table:
        v = _valid_values(tbl, col)
        c = np.bincount(np.searchsorted(edges, v, side="left"), minlength=nb)
        return pa.table({"counts": pa.array([c.tolist()])})

    rows = ds.map_batches(fn, batch_format="pyarrow").take_all()
    out = np.zeros(nb, dtype=np.int64)
    for r in rows:
        out += np.asarray(r["counts"], dtype=np.int64)
    return out


def _fetch_pass(ds, col: str, ranges: list) -> dict:
    """Sorted values for each (lo, hi, lo_open) range — ONLY call with
    small rank-holding ranges."""
    def fn(tbl: pa.Table) -> pa.Table:
        v = _valid_values(tbl, col)
        cols = {}
        for i, (lo, hi, lo_open) in enumerate(ranges):
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= (v > lo) if lo_open else (v >= lo)
            if hi is not None:
                m &= v <= hi
            cols[f"r{i}"] = pa.array([v[m].tolist()])
        return pa.table(cols)

    rows = ds.map_batches(fn, batch_format="pyarrow").take_all()
    return {i: np.sort(np.concatenate(
        [np.asarray(r[f"r{i}"]) for r in rows if len(r[f"r{i}"])] or [[]]))
        for i in range(len(ranges))}


def exact_quantiles(ds, col: str, qs, buckets: int = 256,
                    sample_per_block: int = 64, fetch_cap: int = 1_000_000,
                    max_refine: int = 64):
    """Exact ``quantile_disc`` values of ``ds[col]`` for each q in ``qs``.

    Returns a pyarrow Table ``(q_fp: int64, value)`` with
    ``q_fp = floor(1e6*q)`` (driver-contract fixed point) and ``value``
    the exact order statistic at zero-based rank ``max(ceil(q*n)-1, 0)``.

    Passes over the data: 1 sample + ≤``max_refine`` count + 1 fetch —
    each a streaming ``map_batches`` reducing to O(buckets) driver state.
    """
    qs = list(qs)
    n, samp = _sample_pass(ds, col, sample_per_block)
    if n == 0:
        return pa.table({"q_fp": pa.array([], type=pa.int64()),
                         "value": pa.array([], type=pa.float64())})
    ranks = [max(math.ceil(q * n) - 1, 0) for q in qs]

    # initial edges: boundary values at equal sample mass
    if len(samp):
        idx = np.linspace(0, len(samp) - 1, min(buckets - 1, len(samp)))
        edges = np.unique(samp[idx.round().astype(np.int64)])
    else:  # degenerate: no sample (all blocks empty after filter)
        edges = np.array([])

    # refine: locate each rank's bucket; re-split oversized ones in-range.
    # state per rank: value range (lo, hi] (None = unbounded) + rank offset
    # of lo, resolved flag.
    counts = _count_pass(ds, col, edges)
    cum = np.concatenate([[0], np.cumsum(counts)])
    state = {}
    for i, r in enumerate(ranks):
        j = int(np.searchsorted(cum, r + 1, side="left")) - 1  # bucket of r
        lo = None if j == 0 else edges[j - 1]
        hi = None if j == len(edges) else edges[j]
        state[i] = {"lo": lo, "hi": hi, "off": int(cum[j]),
                    "cnt": int(counts[j]), "val": None}

    for _ in range(max_refine):
        todo = [i for i, s in state.items()
                if s["val"] is None and s["cnt"] > fetch_cap]
        if not todo:
            break
        for i in todo:
            s = state[i]
            # degenerate range: one distinct value left -> that's the answer
            if s["lo"] is not None and s["hi"] is not None and not (
                    s["hi"] > s["lo"]):
                s["val"] = s["hi"]
                continue
            sub = np.unique(np.linspace(
                s["lo"] if s["lo"] is not None else float(samp[0]),
                s["hi"] if s["hi"] is not None else float(samp[-1]),
                buckets + 1)[1:-1])
            if not len(sub):
                s["val"] = s["hi"] if s["hi"] is not None else float(samp[-1])
                continue
            c = _counts_in_range(ds, col, s, sub)
            cc = np.concatenate([[0], np.cumsum(c)])
            r = ranks[i] - s["off"]
            j = int(np.searchsorted(cc, r + 1, side="left")) - 1
            new_lo = s["lo"] if j == 0 else sub[j - 1]
            new_hi = s["hi"] if j == len(sub) else sub[j]
            if (new_lo is not None and new_hi is not None
                    and new_lo == s["lo"] and new_hi == s["hi"]):
                # range stopped shrinking: point mass -> answer is hi of
                # the first sub-bucket holding the rank
                s["val"] = new_hi
                continue
            s.update(lo=new_lo, hi=new_hi, off=s["off"] + int(cc[j]),
                     cnt=int(c[j]))

    # fetch the surviving small buckets (dedup identical ranges)
    pending = [i for i, s in state.items() if s["val"] is None]
    uniq: dict = {}
    for i in pending:
        s = state[i]
        key = (s["lo"], s["hi"])
        uniq.setdefault(key, []).append(i)
    ranges = [(lo, hi, lo is not None) for lo, hi in uniq]
    fetched = _fetch_pass(ds, col, ranges)
    for k, (key, members) in enumerate(uniq.items()):
        vals = fetched[k]
        for i in members:
            s = state[i]
            s["val"] = vals[ranks[i] - s["off"]]

    return pa.table({
        "q_fp": pa.array([int(math.floor(1e6 * q)) for q in qs],
                         type=pa.int64()),
        "value": pa.array([_pyval(state[i]["val"]) for i in range(len(qs))]),
    })


def grouped_quantiles_counted(ds, key: str, col: str, qs,
                              null_key: str = "__null__") -> pa.Table:
    """Exact per-group ``quantile_disc`` for a LOW-CARDINALITY-VALUE column
    in one streaming pass — no per-group refinement loop.

    Works off the sparse value histogram: per batch, Arrow ``group_by``
    collapses to ``(key, value, n)`` partials (≤ groups × distinct values
    rows per block, regardless of block row count); one Ray groupby-sum
    merges the partials (the only exchange, and it moves pre-aggregated
    counts, never data rows); the driver sorts the ≤ groups × distinct
    final histogram and reads each rank off the cumsum.  Exact for any
    integer/categorical column whose distinct-value count is bounded
    (token lengths, scores, codes) — the complement of
    :func:`exact_quantiles`, which handles unbounded domains.

    Returns ``(key, q_fp, value)`` sorted by (key, q_fp); groups whose
    values are all null are dropped (callers' SQL mirrors with
    ``HAVING count(col) > 0``).
    """
    qs = list(qs)

    def partial(tbl: pa.Table) -> pa.Table:
        t = pa.table({
            key: pc.fill_null(pc.cast(tbl[key], pa.string()), null_key),
            col: tbl[col],
        }).filter(pc.is_valid(tbl[col]))
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return g.rename_columns([key, col, "n"])

    hist = ds.map_batches(partial, batch_format="pyarrow")
    merged = hist.groupby([key, col]).sum("n")
    rows = merged.take_all()  # ≤ groups × distinct values

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[key], []).append((r[col], r["sum(n)"]))

    out_k, out_q, out_v = [], [], []
    for k in sorted(by_key):
        vc = sorted(by_key[k])
        cum = np.cumsum([c for _, c in vc])
        n = int(cum[-1])
        for q in qs:
            r = max(math.ceil(q * n) - 1, 0)
            j = int(np.searchsorted(cum, r + 1, side="left"))
            out_k.append(k)
            out_q.append(int(math.floor(1e6 * q)))
            out_v.append(_pyval(vc[j][0]))
    return pa.table({key: pa.array(out_k, type=pa.string()),
                     "q_fp": pa.array(out_q, type=pa.int64()),
                     "value": pa.array(out_v)})


def _counts_in_range(ds, col: str, s: dict, sub: np.ndarray) -> np.ndarray:
    """Histogram of values within (s.lo, s.hi] over sub-edges ``sub``."""
    nb = len(sub) + 1

    def fn(tbl: pa.Table) -> pa.Table:
        v = _valid_values(tbl, col)
        m = np.ones(len(v), dtype=bool)
        if s["lo"] is not None:
            m &= v > s["lo"]
        if s["hi"] is not None:
            m &= v <= s["hi"]
        c = np.bincount(np.searchsorted(sub, v[m], side="left"), minlength=nb)
        return pa.table({"counts": pa.array([c.tolist()])})

    rows = ds.map_batches(fn, batch_format="pyarrow").take_all()
    out = np.zeros(nb, dtype=np.int64)
    for r in rows:
        out += np.asarray(r["counts"], dtype=np.int64)
    return out


def _pyval(v):
    return v.item() if isinstance(v, np.generic) else v


def grouped_rank_counts(ds, key: str, col: str, id_col: str = "doc_id"):
    """Per-row PERCENTILE-RANK without a global sort: appends to every
    row ``r_lt`` = count of rows in its group with a strictly smaller
    value and ``n_grp`` = its group's row count — exactly SQL's
    ``rank() OVER (PARTITION BY key ORDER BY col) − 1`` and
    ``count(*) OVER (PARTITION BY key)``.

    The window function that would normally force a per-group sort is
    replaced by the sparse value histogram (works whenever the value
    domain is bounded — token lengths, scores, codes): per-batch
    ``(key, value, n)`` Arrow partials, ONE pre-aggregated groupby-sum
    exchange, a driver cumsum per group (≤ groups × distinct values of
    state), then a broadcast lookup in a streaming flag pass — data
    rows never shuffle and nothing is ever sorted but the tiny
    histogram.  Rows with a null key or value are dropped (mirror with
    ``WHERE`` in SQL).
    """
    def partial(tbl: pa.Table) -> pa.Table:
        t = pa.table({key: tbl[key], col: tbl[col]}).filter(
            pc.and_(pc.is_valid(tbl[key]), pc.is_valid(tbl[col])))
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return g.rename_columns([key, col, "n"])

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key, col]).sum("n").take_all()

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[key], []).append((r[col], r["sum(n)"]))
    lut = {}
    for k, vc in by_key.items():
        vc.sort()
        vals = np.array([v for v, _ in vc], dtype=np.int64)
        cnts = np.array([c for _, c in vc], dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        lut[k] = (vals, below, int(cnts.sum()))

    def flag(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.and_(pc.is_valid(tbl[key]),
                               pc.is_valid(tbl[col])))
        x = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
        ks = t[key].to_numpy(zero_copy_only=False)
        r_lt = np.empty(len(x), dtype=np.int64)
        n_grp = np.empty(len(x), dtype=np.int64)
        for k in np.unique(ks):                      # ≤ |groups| iterations
            m = ks == k
            vals, below, tot = lut[k]
            r_lt[m] = below[np.searchsorted(vals, x[m])]
            n_grp[m] = tot
        return pa.table({
            id_col: pc.fill_null(pc.cast(t[id_col], pa.string()), ""),
            key: t[key],
            col: pc.cast(t[col], pa.int64()),
            "r_lt": pa.array(r_lt, type=pa.int64()),
            "n_grp": pa.array(n_grp, type=pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")
