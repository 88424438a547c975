"""Sequence packing — the concatenate-and-chunk layout LLM training uses:
documents are laid end-to-end in a deterministic global order (``doc_id``)
and the token stream is cut into fixed-capacity bins; a document spans
bins ``[start//C, (end-1)//C]``.

The core primitive is a **distributed prefix-scan** (``global_offsets``):
each row's offset = sum of ``value_col`` over all rows that sort before
it.  Shape (no full sort, ONE bucket exchange):

1. sample order-key boundaries per batch (deterministic stride) → B
   range buckets — bucketing only routes rows, the OUTPUT is
   bucket-independent;
2. per-batch partials ``(bucket, sum)`` → driver folds the tiny B-row
   table into cumulative bucket base offsets (broadcast);
3. one ``groupby(bucket)`` co-partitions rows; each group sorts its own
   rows (range-disjoint from every other group) and emits
   ``base[bucket] + in-bucket exclusive cumsum``.

At 100 TB the exchange moves each row once (same cost class as any
repartition) and the driver holds only B partial rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _order_boundaries(ds, order_col: str, n_buckets: int):
    """Deterministic range-bucket boundaries: every batch contributes an
    evenly-strided sample of its sorted keys; the driver picks B-1
    quantile boundaries from the merged sample.  Correctness does not
    depend on boundary quality — only balance does."""

    def sample(t: pa.Table) -> pa.Table:
        keys = pc.drop_null(t[order_col]).sort()
        if len(keys) == 0:
            return pa.table({order_col: keys})
        stride = max(1, len(keys) // 32)
        return pa.table({order_col: keys.take(
            pa.array(range(0, len(keys), stride)))})

    rows = ds.select_columns([order_col]).map_batches(
        sample, batch_format="pyarrow").take_all()
    keys = sorted(r[order_col] for r in rows)
    if not keys:
        return []
    idx = np.linspace(0, len(keys) - 1, n_buckets + 1).astype(int)[1:-1]
    # dedupe (heavy duplicates would create empty buckets — harmless)
    seen, bounds = set(), []
    for i in idx:
        if keys[i] not in seen:
            seen.add(keys[i])
            bounds.append(keys[i])
    return bounds


def global_offsets(ds, value_col: str = "n_tok", order_col: str = "doc_id",
                   n_buckets: int = None, out_col: str = "offset"):
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` in
    global ``order_col`` order (ties broken by the key itself — the
    order key must be unique, which ``doc_id`` is by contract).

    Null order keys are dropped (they have no defined position); null
    values count as 0.
    """
    import ray

    if n_buckets is None:
        from xema_ray.stages.shuffle import default_shuffle_buckets

        n_buckets = default_shuffle_buckets()
    bounds = _order_boundaries(ds, order_col, n_buckets)
    bounds_arr = pa.array(bounds)
    bref = ray.put(bounds_arr)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[order_col]))
        b = ray.get(bref)
        if len(b) == 0:
            bucket = np.zeros(t.num_rows, dtype=np.int32)
        else:
            keys = t[order_col].to_numpy(zero_copy_only=False)
            bucket = np.searchsorted(
                np.asarray(b.to_pylist()), keys, side="right"
            ).astype(np.int32)
        return t.append_column("_pb", pa.array(bucket, type=pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # tiny per-batch partials -> driver fold into cumulative bucket bases
    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "_pb": t["_pb"],
            "v": pc.fill_null(pc.cast(t[value_col], pa.int64()), 0),
        }).group_by("_pb").aggregate([("v", "sum")])
        return g

    parts = bucketed.map_batches(partial, batch_format="pyarrow").take_all()
    sums = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in parts:
        sums[r["_pb"]] += r["v_sum"]
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]])
    bases_ref = ray.put(bases)

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # value tiebreak: duplicate order keys (the corpus plants dup
        # doc_ids) must order deterministically; remaining exact ties are
        # indistinguishable rows, so the OUTPUT row set stays stable
        g = g.sort_values([order_col, value_col],
                          kind="stable").reset_index(drop=True)
        v = g[value_col].fillna(0).to_numpy(dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(v)[:-1]])
        base = ray.get(bases_ref)[int(g["_pb"].iloc[0])]
        g[out_col] = off + base
        return g.drop(columns=["_pb"])

    return bucketed.groupby("_pb").map_groups(in_bucket, batch_format="pandas")


def pack_assignments(ds, capacity: int, value_col: str = "n_tok",
                     order_col: str = "doc_id", n_buckets: int = None):
    """Concatenate-and-chunk packing: lay rows end-to-end in
    ``order_col`` order and cut the stream into fixed ``capacity`` bins.

    Returns rows ``(order_col, value_col, offset, bin_first, bin_last,
    n_bins)``; rows with null/zero value get ``bin_first = bin_last =
    offset//capacity`` (they sit at a point in the stream).
    """
    withoff = global_offsets(ds, value_col=value_col, order_col=order_col,
                             n_buckets=n_buckets)

    def bins(t: pa.Table) -> pa.Table:
        off = t["offset"].to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(t[value_col], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        first = off // capacity
        last = np.where(v > 0, (off + v - 1) // capacity, first)
        return pa.table({
            order_col: t[order_col],
            value_col: t[value_col],
            "offset": t["offset"],
            "bin_first": pa.array(first, type=pa.int64()),
            "bin_last": pa.array(last, type=pa.int64()),
            "n_bins": pa.array(last - first + 1, type=pa.int64()),
        })

    return withoff.map_batches(bins, batch_format="pyarrow")
