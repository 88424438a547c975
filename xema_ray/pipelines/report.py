"""One-pass corpus quality report.

`column_stats`, per-source length histograms (drift input), referential
check and within-row duplicate counts each stream the corpus once;  at
100 TB the token column dominates I/O, so this module fuses them into ONE
``map_batches`` pass emitting a single pickled partial per batch (stats +
HLL registers + histogram counts + check counters are all associative),
merged on the driver.  Used by ``bench.py`` as the combined-report stage.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.sketches import Histogram, HyperLogLog
from xema_ray.stages.stats import _batch_column_partial


class _ReportPartials:
    """Per-batch fused partial (stats/HLL/hists/check counters).

    Instantiated once on the driver and shipped in the task closure
    (stateless-task parallelism; the captured state is a few KB)."""

    def __init__(self, columns, valid_sources, hll_p: int = 14,
                 key: str = "source", list_col: str = "tokens"):
        self.columns = columns
        self.valid_sources = pa.array(sorted(valid_sources), type=pa.string())
        self.hll_p = hll_p
        self.key = key
        self.list_col = list_col
        self.edges = Histogram.log_bins().edges

    def __call__(self, tbl: pa.Table) -> pa.Table:
        return pa.table({"partial": pa.array([pickle.dumps(self.partial(tbl))],
                                             type=pa.binary())})

    def partial(self, tbl: pa.Table) -> dict:
        """The raw per-batch partial (no serialization) — callers that
        accumulate in-process (the checkpoint runner) use this directly
        instead of pickling/unpickling per batch."""
        out: dict = {"stats": {}, "hists": {}, "ref_bad": 0, "inrow_dup": 0}
        for c in self.columns:
            if c in tbl.column_names:
                out["stats"][c] = _batch_column_partial(tbl[c], self.hll_p)

        if self.key in tbl.column_names and self.list_col in tbl.column_names:
            mask = pc.and_(pc.is_valid(tbl[self.key]), pc.is_valid(tbl[self.list_col]))
            keep = tbl.filter(mask)
            if keep.num_rows:
                k = keep[self.key].combine_chunks()
                ln = pc.list_value_length(keep[self.list_col]).combine_chunks() \
                    .to_numpy(zero_copy_only=False)
                enc = k.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                for ci, name in enumerate(enc.dictionary.to_pylist()):
                    cnts, _ = np.histogram(ln[codes == ci], bins=self.edges)
                    out["hists"][name] = cnts

        if self.key in tbl.column_names:
            col = tbl[self.key]
            bad = pc.and_(pc.invert(pc.is_in(col, value_set=self.valid_sources)),
                          pc.is_valid(col))
            out["ref_bad"] = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0

        if self.list_col in tbl.column_names:
            from xema_ray.functions.kernels import _list_offsets, inrow_duplicate_rows

            values, offsets = _list_offsets(tbl[self.list_col])
            if len(values):
                vals = values.to_numpy(zero_copy_only=False)
                out["inrow_dup"] = int(len(inrow_duplicate_rows(vals, offsets)))

        return out


def corpus_report(ds, valid_sources, columns: Optional[list] = None,
                  key: str = "source", list_col: str = "tokens") -> dict:
    """Fused single-pass report: per-column stats, per-source length
    histograms, referential + within-row-dup counters."""
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    fn = _ReportPartials(columns, list(valid_sources), key=key, list_col=list_col)
    parts = ds.map_batches(fn, batch_format="pyarrow").take_all()
    return _merge_report_rows(parts)


def _merge_report_rows(parts: list) -> dict:
    """Merge pickled per-batch partial rows (associative)."""
    return _merge_report_partials([pickle.loads(row["partial"]) for row in parts])


def _merge_report_partials(parts: list) -> dict:
    """Merge RAW per-batch partial dicts (associative)."""
    stats_acc: dict = {}
    hlls: dict = {}
    hists: dict = {}
    ref_bad = 0
    inrow_dup = 0
    edges = Histogram.log_bins().edges
    for p in parts:
        ref_bad += p["ref_bad"]
        inrow_dup += p["inrow_dup"]
        for name, cnts in p["hists"].items():
            h = hists.setdefault(name, Histogram(edges))
            h.counts += np.asarray(cnts, dtype=np.int64)
        for c, s in p["stats"].items():
            acc = stats_acc.setdefault(c, {"count": 0, "nulls": 0, "min": None,
                                           "max": None, "sum": 0.0, "has_sum": False})
            acc["count"] += s["count"]
            acc["nulls"] += s["nulls"]
            if s["min"] is not None:
                acc["min"] = s["min"] if acc["min"] is None else min(acc["min"], s["min"])
            if s["max"] is not None:
                acc["max"] = s["max"] if acc["max"] is None else max(acc["max"], s["max"])
            if s["sum"] is not None:
                acc["sum"] += float(s["sum"])
                acc["has_sum"] = True
            if s["hll"] is not None:
                h = HyperLogLog.from_bytes(s["hll"])
                if c in hlls:
                    hlls[c].merge(h)
                else:
                    hlls[c] = h

    stats = {}
    for c, s in stats_acc.items():
        non_null = s["count"] - s["nulls"]
        stats[c] = {
            "count": s["count"], "nulls": s["nulls"],
            "null_rate": s["nulls"] / s["count"] if s["count"] else 0.0,
            "min": s["min"], "max": s["max"],
            "mean": (s["sum"] / non_null) if (s["has_sum"] and non_null) else None,
            "distinct": round(hlls[c].estimate()) if c in hlls else None,
        }
    return {
        "column_stats": stats,
        "length_histograms": hists,
        "referential_violations": ref_bad,
        "rows_with_inrow_dup_tokens": inrow_dup,
    }
