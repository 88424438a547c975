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


def _hash_count_blobs(col_name: str, bucket_bits: int):
    """Per-batch partial: per hash-range bucket, one packed blob of
    (sorted uint64 id-hashes, counts).  16 bytes per distinct id per batch
    crosses the wire — never the strings themselves."""
    from xema_ray.functions.sketches import hash_strings

    def fn(tbl: pa.Table) -> pa.Table:
        ids = tbl[col_name].combine_chunks().drop_null()
        out_b, out_blob = [], []
        if len(ids):
            h = hash_strings(ids.to_pylist())
            uniq, cnt = np.unique(h, return_counts=True)
            bucket = (uniq >> np.uint64(64 - bucket_bits)).astype(np.int32)
            for b in np.unique(bucket):
                sel = bucket == b
                out_b.append(int(b))
                out_blob.append(
                    np.concatenate([uniq[sel].view(np.int64), cnt[sel]]).tobytes()
                )
        return pa.table({"bucket": pa.array(out_b, type=pa.int32()),
                         "blob": pa.array(out_blob, type=pa.binary())})

    return fn


def _merge_blobs(blobs) -> tuple:
    """Merge packed (hashes, counts) blobs; return (dup_hashes, dup_counts)."""
    hs, cs = [], []
    for blob in blobs:
        a = np.frombuffer(blob, dtype=np.int64)
        k = len(a) // 2
        hs.append(a[:k])
        cs.append(a[k:])
    if not hs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    h = np.concatenate(hs)
    c = np.concatenate(cs)
    order = np.argsort(h, kind="stable")
    h, c = h[order], c[order]
    new = np.empty(len(h), dtype=bool)
    new[0] = True
    np.not_equal(h[1:], h[:-1], out=new[1:])
    gidx = np.cumsum(new) - 1
    sums = np.zeros(int(gidx[-1]) + 1, dtype=np.int64)
    np.add.at(sums, gidx, c)
    firsts = h[new]
    dup = sums > 1
    return firsts[dup], sums[dup]


def duplicate_values(ds, col: str = "doc_id", strategy: str = "auto",
                     bucket_bits: Optional[int] = None,
                     auto_driver_limit: int = 64_000_000):
    """Dataset of ``(col, n_occurrences)`` for values appearing more than
    once — the table-scale exact-uniqueness shuffle.

    Two-phase hash aggregation: per-batch partials carry only packed 64-bit
    id-hash/count blobs (no strings move).  ``strategy='driver'`` merges the
    blobs on the driver (right when Σdistinct-per-batch is small/medium);
    ``'groupby'`` merges them through a hash-range ``groupby(bucket)``
    (the multi-node path — bump ``bucket_bits`` with cluster size);
    ``'auto'`` measures Σdistinct-per-batch from the materialized partials
    (16 bytes per distinct value per batch) and picks the driver merge only
    below ``auto_driver_limit`` rows — above it the single-threaded driver
    reduce would be the bottleneck and the hash-range groupby wins.  A
    second column-pruned pass resolves duplicate hashes back to the actual
    id strings and exact counts (broadcast ``is_in`` semi-join).
    """
    import ray.data as rd
    from xema_ray.functions.sketches import hash_strings

    if bucket_bits is None:
        from xema_ray.stages.shuffle import default_bucket_bits

        bucket_bits = default_bucket_bits()  # cluster-aware (r3 item 10)
    thin = ds.select_columns([col])
    partials = thin.map_batches(
        _hash_count_blobs(col, bucket_bits), batch_format="pyarrow"
    )

    if strategy == "auto":
        # blobs are tiny relative to the data — materializing them costs
        # far less than re-running the scan for a second consumption
        partials = partials.materialize()
        nbytes = sum(r["n"] for r in partials.map_batches(
            lambda t: pa.table(
                {"n": [pc.sum(pc.binary_length(t["blob"])).as_py() or 0]}),
            batch_format="pyarrow",
        ).take_all())
        strategy = "driver" if nbytes // 16 <= auto_driver_limit else "groupby"

    if strategy == "driver":
        blobs = [r["blob"] for r in partials.take_all()]
        dup_h, _ = _merge_blobs(blobs)
    else:
        import pandas as pd

        def merge_group(g: pd.DataFrame) -> pd.DataFrame:
            h, n = _merge_blobs(list(g["blob"]))
            return pd.DataFrame({"h": h, "n": n})

        rows = partials.groupby("bucket").map_groups(
            merge_group, batch_format="pandas"
        ).take_all()
        dup_h = np.array([r["h"] for r in rows], dtype=np.int64)

    if len(dup_h) == 0:
        return rd.from_arrow(pa.table({
            col: pa.array([], type=pa.string()),
            "n_occurrences": pa.array([], type=pa.int64()),
        }))

    dup_set = pa.array(np.sort(dup_h), type=pa.int64())
    n_buckets = 1 << bucket_bits

    def resolve(tbl: pa.Table) -> pa.Table:
        empty = pa.table({col: pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64()),
                          "bucket": pa.array([], type=pa.int32())})
        ids = tbl[col].combine_chunks().drop_null()
        if len(ids) == 0:
            return empty
        h = pa.array(hash_strings(ids.to_pylist()).view(np.int64), type=pa.int64())
        hits = ids.filter(pc.is_in(h, value_set=dup_set))
        vc = hits.value_counts()
        if len(vc) == 0:
            return empty
        vals = pc.cast(vc.field("values"), pa.string())
        bucket = (hash_strings(vals.to_pylist()) % n_buckets).astype(np.int32)
        return pa.table({col: vals,
                         "cnt": pc.cast(vc.field("counts"), pa.int64()),
                         "bucket": pa.array(bucket, type=pa.int32())})

    resolved = thin.map_batches(resolve, batch_format="pyarrow")

    def final_merge(df) -> "pd.DataFrame":
        import pandas as pd

        g = df.groupby(col, sort=True)["cnt"].sum()
        g = g[g > 1]
        return pd.DataFrame({col: g.index.to_numpy(dtype=object),
                             "n_occurrences": g.to_numpy(dtype=np.int64)})

    if strategy == "driver":
        # bounded: the auto lane chose 'driver' only when Σdistinct-per-
        # batch is small; dup occurrences are a subset of that
        import pandas as pd

        frames = [b.to_pandas() for b in
                  resolved.iter_batches(batch_format="pyarrow")]
        merged = final_merge(pd.concat(frames, ignore_index=True)
                             .drop(columns=["bucket"])) if frames \
            else None
        if merged is None or not len(merged):
            return rd.from_arrow(pa.table({
                col: pa.array([], type=pa.string()),
                "n_occurrences": pa.array([], type=pa.int64())}))
        return rd.from_arrow(pa.Table.from_pandas(
            merged, preserve_index=False).cast(pa.schema(
                [(col, pa.string()), ("n_occurrences", pa.int64())])))
    # multi-node lane: each value lands in exactly one bucket, so
    # per-bucket folds are globally complete — no driver state at all
    return resolved.groupby("bucket").map_groups(
        lambda g: final_merge(g.drop(columns=["bucket"])),
        batch_format="pandas")


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


def referential_violations(ds, dim, col: str = "source", dim_col: Optional[str] = None):
    """Rows of ``ds`` whose ``col`` has no match in ``dim`` (anti-join).

    ``dim`` may be a list/set of values, a pyarrow Table, or a (small) ray
    Dataset.  Small dims (≤ ~100k values) ship inside the task closure
    (serialized once per task spec, cached in plasma); larger ones go
    through ``ray.put`` + a stateful actor pool.  Either way the fact side
    streams with NO shuffle — this is a broadcast anti-join.
    """
    import ray

    dim_col = dim_col or col
    if isinstance(dim, (list, set, tuple)):
        values = list(dim)
    elif isinstance(dim, pa.Table):
        values = dim[dim_col].to_pylist()
    else:  # ray Dataset
        values = [r[dim_col] for r in dim.select_columns([dim_col]).take_all()]
    value_set = pa.array(sorted({v for v in values if v is not None}), type=pa.string())

    def check(tbl: pa.Table, vs: pa.Array) -> pa.Table:
        c = tbl[col]
        bad = pc.and_(pc.invert(pc.is_in(c, value_set=vs)), pc.is_valid(c))
        t = tbl.filter(bad)
        n = t.num_rows
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.string()) if "doc_id" in t.column_names
            else pa.nulls(n, type=pa.string()),
            "path": pa.array([f"/{col}"] * n, type=pa.string()),
            "keyword": pa.array(["ref"] * n, type=pa.string()),
            "message": pa.array(
                [f"{col}={v!r} not in dimension table" for v in t[col].to_pylist()],
                type=pa.string()),
        })

    if len(value_set) <= 100_000:
        return ds.map_batches(lambda t: check(t, value_set), batch_format="pyarrow")

    ref = ray.put(value_set)

    class RefCheckActor:
        def __init__(self):
            self.value_set = ray.get(ref)  # one plasma read per actor

        def __call__(self, tbl: pa.Table) -> pa.Table:
            return check(tbl, self.value_set)

    return ds.map_batches(RefCheckActor, batch_format="pyarrow", concurrency=(1, 8))


def referential_violations_bloom(ds, dim, col: str = "source",
                                 dim_col: Optional[str] = None,
                                 fp_rate: float = 0.01):
    """Bloom-filter broadcast anti-join for dims too large even for a raw
    value-set broadcast (~10 bits/element).  Candidate violations (filter
    misses) are EXACT; ~``fp_rate`` of true violations slip through as
    false filter hits — use :func:`referential_violations_semijoin` when
    exactness matters at that scale (documented trade-off).
    """
    import ray

    from xema_ray.functions.sketches import BloomFilter, hash_strings

    dim_col = dim_col or col
    if isinstance(dim, (list, set, tuple)):
        values = [v for v in dim if v is not None]
    elif isinstance(dim, pa.Table):
        values = dim[dim_col].drop_null().to_pylist()
    else:
        values = [r[dim_col] for r in dim.select_columns([dim_col]).take_all()
                  if r[dim_col] is not None]
    bf = BloomFilter(max(1, len(values)), fp_rate=fp_rate)
    if values:
        bf.add_hashes(hash_strings(values))
    ref = ray.put(bf)

    class BloomCheck:
        def __init__(self):
            self.bf = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            c = tbl[col].combine_chunks()
            valid_mask = pc.is_valid(c)
            vals = c.drop_null().to_pylist()
            if vals:
                hits = self.bf.contains_hashes(hash_strings(vals))
            else:
                hits = np.empty(0, dtype=bool)
            bad_nonnull = ~hits
            bad = np.zeros(len(c), dtype=bool)
            bad[np.nonzero(valid_mask.to_numpy(zero_copy_only=False))[0]] = bad_nonnull
            t = tbl.filter(pa.array(bad))
            n = t.num_rows
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.string()) if "doc_id" in t.column_names
                else pa.nulls(n, type=pa.string()),
                "path": pa.array([f"/{col}"] * n, type=pa.string()),
                "keyword": pa.array(["ref"] * n, type=pa.string()),
                "message": pa.array(
                    [f"{col}={v!r} not in dimension filter" for v in t[col].to_pylist()],
                    type=pa.string()),
            })

    return ds.map_batches(BloomCheck, batch_format="pyarrow", concurrency=(1, 8))


def referential_violations_semijoin(ds, dim_ds, col: str = "source",
                                    dim_col: Optional[str] = None,
                                    buckets: Optional[int] = None):
    """General-path referential check for dims too large to broadcast:
    explicit bucketed hash ANTI-join (ray guide "Joins and lookups").

    Both sides get ``bucket = hash(key) % B``; a ``groupby(bucket)``
    co-partitions them, and each bucket group anti-joins fact keys against
    dim keys with pandas.  Only the two key columns shuffle.  ``buckets``
    scales with cluster size; hot keys spread by bucketing the FACT side on
    the key value itself (identical keys co-locate — required for
    correctness — so a single pathological key should instead use the
    broadcast path, which needs no shuffle at all).
    """
    import pandas as pd

    from xema_ray.stages.shuffle import add_hash_bucket, default_shuffle_buckets

    if buckets is None:
        buckets = default_shuffle_buckets()  # cluster-aware (r3 item 10)
    dim_col = dim_col or col
    fact = ds.select_columns([c for c in dict.fromkeys(["doc_id", col])
                              if c in ds.schema().names])
    fact = add_hash_bucket(fact, col, buckets)
    fact = fact.map_batches(
        lambda t: t.append_column("_side", pa.array(["f"] * t.num_rows)),
        batch_format="pyarrow")
    dim = dim_ds.select_columns([dim_col])
    if dim_col != col:
        dim = dim.map_batches(
            lambda t: t.rename_columns([col]), batch_format="pyarrow")
    dim = add_hash_bucket(dim, col, buckets)
    dim = dim.map_batches(
        lambda t: t.append_column("_side", pa.array(["d"] * t.num_rows)),
        batch_format="pyarrow")

    both = fact.union(dim)

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        dims = set(g.loc[g["_side"] == "d", col])
        f = g[g["_side"] == "f"]
        bad = f[~f[col].isin(dims) & f[col].notna()]
        return pd.DataFrame({
            "doc_id": (bad["doc_id"] if "doc_id" in bad.columns
                       else pd.Series([None] * len(bad))).astype("string"),
            "path": pd.Series([f"/{col}"] * len(bad), dtype="string"),
            "keyword": pd.Series(["ref"] * len(bad), dtype="string"),
            "message": pd.Series(
                [f"{col}={v!r} not in dimension table" for v in bad[col]],
                dtype="string"),
        })

    return both.groupby("bucket").map_groups(anti, batch_format="pandas")


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
    # a source that VANISHED from the current data is the most drastic
    # drift of all — report it instead of silently omitting (review r2)
    for k in sorted(set(reference) - set(current)):
        out[k] = {"ks": None, "psi": None, "n": 0, "drifted": True,
                  "reason": "source missing from current data"}
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
