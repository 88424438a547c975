"""Table-level checks — Xema's per-value semantics lifted to corpus scale
(SURVEY.md §2.4): exact uniqueness, referential integrity, distribution
drift.  Each check documents its partitioning/shuffle strategy.

* uniqueness: ``unique_items`` (validator.ex:618-648) lifted to a column —
  per-batch partial counts then a hash-partitioned ``groupby(col).sum``;
  only (distinct-per-batch id, count) rows shuffle, never the data rows.
* referential: ``ref``/``dependencies`` presence semantics
  (validator.ex:965-1004) — broadcast the small dimension side via
  ``ray.put`` and run a vectorized ``is_in`` anti-filter per batch (semi/anti
  join without a shuffle); a shuffle semi-join is only needed when the dim
  side is too big to broadcast (not the case for source registries).
* drift: per-``source`` token-length histograms (mergeable partials,
  :mod:`xema_ray.stages.stats`) compared with two-sample KS + PSI against a
  reference capture.  The 90%-"web" skew is harmless because partials are
  pre-aggregated per batch before the tiny groupby.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.sketches import Histogram, ks_statistic, psi
from xema_ray.stages.stats import grouped_length_histograms


# ----------------------------------------------------------------------
# exact uniqueness
# ----------------------------------------------------------------------


def _batch_value_counts(col_name: str):
    def fn(tbl: pa.Table) -> pa.Table:
        vc = tbl[col_name].combine_chunks().drop_null().value_counts()
        if len(vc) == 0:
            return pa.table({col_name: pa.array([], type=tbl[col_name].type),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({
            col_name: vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })
    return fn


def duplicate_values(ds, col: str = "doc_id"):
    """Dataset of ``(col, n_occurrences)`` for values appearing more than
    once.  Column-pruned at the source; per-batch pre-aggregation bounds the
    shuffle to distinct ids per batch."""
    from ray.data.aggregate import Sum

    counts = (
        ds.select_columns([col])
        .map_batches(_batch_value_counts(col), batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="n_occurrences"))
    )
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_occurrences"], 1)),
        batch_format="pyarrow",
    )


def uniqueness_violations(ds, col: str = "doc_id"):
    """Violation rows ``(doc_id, path, keyword, message)`` for duplicate
    ids — the table-scale ``unique_items`` check."""
    dups = duplicate_values(ds, col)

    def to_viol(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": pc.cast(t[col], pa.string()),
            "path": pa.array([f"/{col}"] * n, type=pa.string()),
            "keyword": pa.array(["unique_items"] * n, type=pa.string()),
            "message": pa.array(
                [f"{col} occurs {c} times" for c in t["n_occurrences"].to_pylist()],
                type=pa.string()),
        })

    return dups.map_batches(to_viol, batch_format="pyarrow")


# ----------------------------------------------------------------------
# referential integrity
# ----------------------------------------------------------------------


class _RefCheck:
    """Actor: holds the broadcast key set (fetched once per actor)."""

    def __init__(self, col: str, values_ref):
        import ray

        self.col = col
        vals = ray.get(values_ref) if not isinstance(values_ref, (list, set, tuple)) else values_ref
        self.value_set = pa.array(sorted(set(vals)), type=pa.string())

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = tbl[self.col]
        bad = pc.and_(
            pc.invert(pc.is_in(col, value_set=self.value_set)),
            pc.is_valid(col),
        )
        t = tbl.filter(bad)
        n = t.num_rows
        out = {
            "doc_id": pc.cast(t["doc_id"], pa.string()) if "doc_id" in t.column_names
            else pa.array([None] * n, type=pa.string()),
            "path": pa.array([f"/{self.col}"] * n, type=pa.string()),
            "keyword": pa.array(["ref"] * n, type=pa.string()),
            "message": pa.array(
                [f"{self.col}={v!r} not in dimension table" for v in t[self.col].to_pylist()],
                type=pa.string()),
        }
        return pa.table(out)


def referential_violations(ds, dim, col: str = "source", dim_col: Optional[str] = None):
    """Rows of ``ds`` whose ``col`` has no match in ``dim`` (anti-join).

    ``dim`` may be a list/set of values, a pyarrow Table, or a (small)
    ray Dataset; it is broadcast once via ``ray.put`` and read in each
    actor's ``__init__`` — no shuffle of the fact side.
    """
    import ray

    dim_col = dim_col or col
    if isinstance(dim, (list, set, tuple)):
        values = list(dim)
    elif isinstance(dim, pa.Table):
        values = dim[dim_col].to_pylist()
    else:  # ray Dataset
        values = [r[dim_col] for r in dim.select_columns([dim_col]).take_all()]
    ref = ray.put(values)
    return ds.map_batches(
        _RefCheck,
        fn_constructor_kwargs={"col": col, "values_ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


# ----------------------------------------------------------------------
# distribution drift
# ----------------------------------------------------------------------


def drift_report(
    ds,
    reference: dict,
    key: str = "source",
    list_col: str = "tokens",
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> dict:
    """Two-sample KS + PSI of token-length distributions per ``key`` vs a
    reference capture (``{key: Histogram}`` from
    :func:`capture_reference`).  Returns per-key metrics + drifted flag."""
    current = grouped_length_histograms(ds, key=key, list_col=list_col)
    out = {}
    for k, hist in sorted(current.items()):
        ref = reference.get(k)
        if ref is None:
            out[k] = {"ks": None, "psi": None, "n": hist.total, "drifted": True,
                      "reason": "no reference distribution"}
            continue
        ks = ks_statistic(hist, ref)
        p = psi(hist, ref)
        out[k] = {
            "ks": round(ks, 4),
            "psi": round(p, 4),
            "n": hist.total,
            "drifted": bool(ks > ks_threshold or p > psi_threshold),
        }
    return out


def capture_reference(ds, key: str = "source", list_col: str = "tokens") -> dict:
    """Capture the reference histograms (e.g. from a trusted corpus slice)."""
    return grouped_length_histograms(ds, key=key, list_col=list_col)


def reference_to_json(reference: dict) -> dict:
    return {k: {"edges": h.edges.tolist(), "counts": h.counts.tolist()}
            for k, h in reference.items()}


def reference_from_json(obj: dict) -> dict:
    return {k: Histogram(np.asarray(v["edges"]), np.asarray(v["counts"], dtype=np.int64))
            for k, v in obj.items()}
