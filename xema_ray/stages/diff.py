"""Snapshot DIFF — classify every document across two corpus versions.

The incremental-ingestion primitive a 100-TB pipeline runs daily: given
yesterday's snapshot and today's, report which documents were *added*,
*removed*, *changed* (same id, different content) or *unchanged*, so
downstream stages (dedup, tokenize, index) re-process only the delta.

Scale shape
-----------
* Each side is first reduced to ``(id, digest)`` rows inside
  ``map_batches`` — content never moves; the exchange is O(ids), 16-48
  bytes per row, regardless of document size.
* The two digest tables meet in ONE native hash-partitioned
  ``Dataset.join(join_type="full_outer")``.  Ray coalesces the key
  columns, so side-membership rides as payload flags (cf.
  ``orders_year_spine``), and classification is a vectorized
  per-batch projection of the joined rows.
* Output is O(ids) `(id, status)` rows — stream it to a sink or
  aggregate to per-status counts.

Reference scope: the reference engine validates one table at a time and
has no snapshot story (xema.ex:39-133 API surface); this operator is
part of the training-data layer this repo adds on top.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.stages.dedup import _hash_text_column

STATUSES = ("added", "removed", "changed", "unchanged")


def _digest_side(ds, id_col: str, content_col: str, flag_col: str,
                 digest_name: str, hash_fn: str):
    """(id, digest, <flag>=True) rows — the only payload that shuffles."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            digest_name: _hash_text_column(t, content_col, hash_fn),
            flag_col: pa.array([True] * t.num_rows, pa.bool_()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def snapshot_diff(cur, prev, id_col: str = "doc_id",
                  content_col: str = "text", hash_fn: str = "fast",
                  num_partitions: int = None):
    """Dataset of ``(id_col, status)`` for every id in either snapshot.

    ``hash_fn="fast"`` (default) uses the vectorized 128-bit content
    hash; ``"md5"`` keeps the digest DuckDB-recomputable for oracle
    parity.  ``num_partitions`` defaults to the cluster-derived join
    width.  A doc whose content is null in BOTH snapshots is
    ``unchanged`` (else the daily delta would re-process it forever).
    """
    if num_partitions is None:
        from xema_ray.stages.shuffle import default_shuffle_buckets

        num_partitions = default_shuffle_buckets(per_cpu=1, hi=256)

    left = _digest_side(cur, id_col, content_col, "in_cur", "cur_digest",
                        hash_fn)
    right = _digest_side(prev, id_col, content_col, "in_prev",
                         "prev_digest", hash_fn)
    joined = left.join(right, join_type="full_outer",
                       num_partitions=num_partitions,
                       on=(id_col,), right_on=(id_col,))

    def classify(t: pa.Table) -> pa.Table:
        in_cur = pc.fill_null(t["in_cur"], False)
        in_prev = pc.fill_null(t["in_prev"], False)
        both_null = pc.and_(pc.is_null(t["cur_digest"]),
                            pc.and_(in_cur, pc.and_(
                                in_prev, pc.is_null(t["prev_digest"]))))
        same = pc.or_(pc.fill_null(
            pc.equal(t["cur_digest"], t["prev_digest"]), False), both_null)
        status = pc.if_else(
            pc.and_(in_cur, pc.invert(in_prev)), pa.scalar("added"),
            pc.if_else(
                pc.and_(in_prev, pc.invert(in_cur)), pa.scalar("removed"),
                pc.if_else(same, pa.scalar("unchanged"),
                           pa.scalar("changed"))))
        return pa.table({id_col: t[id_col], "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


def diff_counts(diff_ds, status_col: str = "status") -> dict:
    """Small-side rollup of a :func:`snapshot_diff` result: per-batch
    ``value_counts`` partials folded on the driver (output is ≤4 rows —
    no shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[status_col])
        return pa.table({"status": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    out = {s: 0 for s in STATUSES}
    for row in diff_ds.map_batches(partial,
                                   batch_format="pyarrow").take_all():
        out[row["status"]] = out.get(row["status"], 0) + int(row["n"])
    return out
