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
