"""Deterministic sampling — reproducible Bernoulli / stratified sampling
keyed on a row's id hash, so every rerun (and every engine) selects the
same rows: the property a training-data export needs for auditability.

``hash_fn="md5"`` makes the decision cross-engine recomputable (a SQL
oracle compares ``md5(id)`` hex against the same threshold string);
``hash_fn="fast"`` uses the engine's vectorized xxhash lane
(:func:`xema_ray.functions.sketches.hash_strings`) for the 100 TB path.
No shuffle either way — a pure ``map_batches`` filter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def rate_threshold_hex(rate: float) -> str:
    """32-hex threshold: md5(id) < this hex string ⇔ uniform(id) < rate.

    rate >= 1.0 returns a sentinel that sorts ABOVE every hex digest
    ("g" > "f"), keeping 100% — format(2**128, "032x") would be 33 chars
    and naive truncation silently produced a 2^124 threshold (~6.25%
    keep; code-review r3, confirmed bug)."""
    rate = min(max(rate, 0.0), 1.0)
    if rate >= 1.0:
        return "g" * 32
    return format(int(rate * (1 << 128)), "032x")


def rate_threshold_hex32(rate: float) -> str:
    """8-hex threshold on the md5's top 32 bits: ``md5(id)[:8] < this``
    ⇔ uniform(id) < rate.  Unlike :func:`rate_threshold_hex` the 32-bit
    form is computable inside a SQL engine from a *runtime* rate
    (``lower(lpad(hex(floor(rate*2^32)), 8, '0'))``), which is what a
    mixture oracle needs when the rate itself comes from data.  rate >=
    1 returns the above-every-hex sentinel ('g' > 'f')."""
    rate = min(max(rate, 0.0), 1.0)
    if rate >= 1.0:
        return "g" * 8
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def stratum_counts(ds, strat_col: str = "source") -> dict:
    """Per-stratum row counts via per-batch ``value_counts`` partials
    merged on the driver — the small-side aggregate pattern (output is
    O(#strata), so no groupby shuffle; cf. stages/stats.py)."""
    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[strat_col])
        return pa.table({"stratum": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    out: dict = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out[row["stratum"]] = out.get(row["stratum"], 0) + int(row["n"])
    return out


def mixture_rates(counts: dict, weights: dict, budget: float,
                  default_weight: float = 0.0) -> dict:
    """Per-stratum keep rates hitting target mixture ``weights`` (sum
    ≈ 1) within a row ``budget``: rate_s = min(1, budget·w_s / n_s).
    A stratum too small for its target share saturates at 1.0 (kept
    whole) rather than upweighting — deterministic sampling cannot
    replicate rows."""
    out = {}
    for s, n in counts.items():
        w = weights.get(s, default_weight)
        out[s] = min(1.0, (budget * w) / n) if n else 0.0
    return out


def mixture_sample(ds, weights: dict, budget: float,
                   strat_col: str = "source", id_col: str = "doc_id",
                   default_weight: float = 0.0, counts: dict = None,
                   hash_fn: str = "fast", seed: int = 0):
    """Deterministic domain-mixture sampling: resample each stratum so
    the output approximates the target ``weights`` within ``budget``
    rows (the DoReMi / Pile-style domain reweighting step).

    Two passes over ``ds`` when ``counts`` is not supplied (a tiny
    count aggregate, then the filter) — at 100 TB pass 1 is a
    column-pruned scan of one dictionary column; pass the known corpus
    composition via ``counts`` to skip it.  ``hash_fn="md5"`` compares
    the md5's top 32 bits against a per-stratum 8-hex threshold so a
    SQL oracle can recompute the selection from its own count CTE;
    ``hash_fn="fast"`` is the vectorized xxhash lane.
    """
    if counts is None:
        counts = stratum_counts(ds, strat_col)
    rates = mixture_rates(counts, weights, budget, default_weight)
    thresholds = {s: rate_threshold_hex32(r) for s, r in rates.items()}

    def keep_md5(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        strata = t[strat_col].to_pylist()
        keep = np.zeros(t.num_rows, dtype=bool)
        for i, (v, s) in enumerate(zip(ids, strata)):
            if v is None:
                continue
            thr = thresholds.get(s, "0" * 8)
            keep[i] = hashlib.md5(str(v).encode()).hexdigest()[:8] < thr
        return t.filter(pa.array(keep))

    def keep_fast(t: pa.Table) -> pa.Table:
        from xema_ray.functions.sketches import hash_strings

        ids = t[id_col].to_pylist()
        h = hash_strings([str(v) if v is not None else "" for v in ids],
                         seed=seed)
        u = h.astype(np.float64) / float(1 << 64)
        r = np.array([rates.get(s, 0.0) for s in t[strat_col].to_pylist()])
        keep = (u < r) & np.array([v is not None for v in ids])
        return t.filter(pa.array(keep))

    fn = keep_md5 if hash_fn == "md5" else keep_fast
    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, rates: dict, strat_col: str = "source",
                      id_col: str = "doc_id", default_rate: float = 0.0,
                      hash_fn: str = "fast", seed: int = 0):
    """Keep each row with its stratum's rate, decided by hash(id).

    ``rates`` maps stratum value → keep rate in [0, 1]; unlisted strata
    use ``default_rate``.  Deterministic: the same (id, rate) always
    decides the same way.
    """
    thresholds = {k: rate_threshold_hex(r) for k, r in rates.items()}
    default_thr = rate_threshold_hex(default_rate)

    def keep_md5(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        strata = t[strat_col].to_pylist()
        keep = np.zeros(t.num_rows, dtype=bool)
        for i, (v, s) in enumerate(zip(ids, strata)):
            if v is None:
                continue
            thr = thresholds.get(s, default_thr)
            keep[i] = hashlib.md5(str(v).encode()).hexdigest() < thr
        return t.filter(pa.array(keep))

    def keep_fast(t: pa.Table) -> pa.Table:
        from xema_ray.functions.sketches import hash_strings

        ids = t[id_col].to_pylist()
        h = hash_strings([str(v) if v is not None else "" for v in ids],
                         seed=seed)
        u = h.astype(np.float64) / float(1 << 64)
        strata = t[strat_col].to_pylist()
        r = np.array([rates.get(s, default_rate) for s in strata])
        keep = (u < r) & np.array([v is not None for v in ids])
        return t.filter(pa.array(keep))

    fn = keep_md5 if hash_fn == "md5" else keep_fast
    return ds.map_batches(fn, batch_format="pyarrow")


def train_val_split(ds, val_rate: float = 0.05, id_col: str = "doc_id",
                    hash_fn: str = "fast", seed: int = 0):
    """(train_ds, val_ds) — disjoint deterministic hash split.  Each side
    is an independent lazy filter over ``ds`` (two consumptions)."""

    def side(keep_val: bool):
        thr = rate_threshold_hex(val_rate)

        def f_md5(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_pylist()
            isval = np.array(
                [v is not None
                 and hashlib.md5(str(v).encode()).hexdigest() < thr
                 for v in ids])
            keep = isval if keep_val else (
                ~isval & np.array([v is not None for v in ids]))
            return t.filter(pa.array(keep))

        def f_fast(t: pa.Table) -> pa.Table:
            from xema_ray.functions.sketches import hash_strings

            ids = t[id_col].to_pylist()
            h = hash_strings([str(v) if v is not None else "" for v in ids],
                             seed=seed)
            isval = (h.astype(np.float64) / float(1 << 64)) < val_rate
            nn = np.array([v is not None for v in ids])
            keep = (isval & nn) if keep_val else (~isval & nn)
            return t.filter(pa.array(keep))

        return ds.map_batches(f_md5 if hash_fn == "md5" else f_fast,
                              batch_format="pyarrow")

    return side(False), side(True)


def stratified_topk_sample(ds, k: int, strat_col: str = "source",
                           id_col: str = "doc_id", hash_fn: str = "fast"):
    """EXACT-k per-stratum sample: the ``k`` rows with the smallest
    ``hash(id)`` in each stratum (plus id as tiebreak) — deterministic,
    rerun- and engine-stable, and unlike the rate-based samplers it hits
    the quota exactly regardless of stratum sizes.

    Shape: per-batch per-stratum top-k PARTIALS (k smallest hash rows
    per stratum per batch — one lexsort, no per-row Python) fold on the
    driver over O(#strata · k · #batches) rows; the full strata never
    leave the workers and nothing shuffles.  Returns a pyarrow Table
    ``(strat_col, id_col)``.

    ``hash_fn="md5"`` ranks by the md5 hex of the id so an SQL oracle
    can replay the identical selection (``ORDER BY md5(id), id``);
    ``"fast"`` uses the vectorized xxhash lane.
    """
    import pandas as pd

    def _hashes(ids) -> np.ndarray:
        svals = [str(v) if v is not None else "" for v in ids]
        if hash_fn == "md5":
            import hashlib

            return np.array([hashlib.md5(s.encode()).hexdigest()
                             for s in svals], dtype="S32")
        from xema_ray.functions.sketches import hash_strings

        return hash_strings(np.array(svals, dtype=object))

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        h = _hashes(df[id_col].tolist())
        ids = df[id_col].to_numpy()
        id_key = ids if np.issubdtype(ids.dtype, np.number) \
            else ids.astype("S")
        codes, _ = pd.factorize(df[strat_col].to_numpy())
        order = np.lexsort((id_key, h, codes))
        codes_s = codes[order]
        firsts = np.ones(len(codes_s), dtype=bool)
        firsts[1:] = codes_s[1:] != codes_s[:-1]
        rank = np.arange(len(codes_s)) - np.maximum.accumulate(
            np.where(firsts, np.arange(len(codes_s)), 0))
        keep = order[rank < k]
        return df.iloc[np.sort(keep)][[strat_col, id_col]]

    parts = ds.map_batches(
        lambda df: _topk(df), batch_format="pandas")
    frames = [b.to_pandas() for b in
              parts.iter_batches(batch_format="pyarrow")]
    if not frames:
        # empty result keeps the INPUT column types (hardcoded strings
        # broke schema-sensitive consumers on int ids — code-review r3)
        sch = ds.schema().base_schema
        return pa.table({c: pa.array([], type=sch.field(c).type)
                         for c in (strat_col, id_col)})
    merged = _topk(pd.concat(frames, ignore_index=True))
    return pa.Table.from_pandas(merged.reset_index(drop=True),
                                preserve_index=False)


def split_assign(ds, rates=None, id_col: str = "doc_id",
                 hash_fn: str = "fast", seed: int = 0):
    """Label every row with a deterministic TRAIN/VAL/TEST split.

    Disjoint md5-band rule (``hash_fn="md5"``, SQL-replayable): with
    cumulative thresholds t_i = hex(Σ rates up to i), a row goes to the
    first split whose threshold exceeds ``md5(str(id))``; the remainder
    is ``train``.  The engine default (``hash_fn="fast"``) applies the
    same band rule to the vectorized 64-bit hash.  Assignment is a
    stateless per-batch projection — no shuffle, no state, stable under
    any partitioning, and re-runnable incrementally (a doc's split never
    changes as the corpus grows — the property random splits lack).

    ``rates`` maps split name → rate for the NON-train splits, e.g.
    ``{"test": 0.05, "val": 0.05}`` (insertion order = band order).
    Returns ``ds`` with a ``split`` string column appended.
    """
    rates = dict(rates or {"test": 0.05, "val": 0.05})
    names = list(rates)
    cum, edges = 0.0, []
    for nm in names:
        cum += rates[nm]
        edges.append(cum)

    thr_hex = [rate_threshold_hex(e) for e in edges]

    def assign_md5(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hexes = [hashlib.md5(str(v).encode()).hexdigest()
                 if v is not None else "g" * 32 for v in ids]
        out = []
        for h in hexes:
            lab = "train"
            for nm, th in zip(names, thr_hex):
                if h < th:
                    lab = nm
                    break
            out.append(lab)
        return t.append_column("split", pa.array(out, pa.string()))

    def assign_fast(t: pa.Table) -> pa.Table:
        from xema_ray.functions.sketches import hash_strings

        ids = t[id_col].to_pylist()
        h = hash_strings([str(v) if v is not None else "" for v in ids],
                         seed=seed).astype(np.float64) / float(1 << 64)
        lab = np.full(len(ids), "train", dtype=object)
        prev = 0.0
        for nm, e in zip(names, edges):
            lab[(h >= prev) & (h < e)] = nm
            prev = e
        return t.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(assign_md5 if hash_fn == "md5" else assign_fast,
                          batch_format="pyarrow")
