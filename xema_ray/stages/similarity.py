"""Similarity search over an embedding column (``list<float>``).

* brute-force cosine top-k — the exact baseline: the (small) query matrix is
  broadcast once via ``ray.put``; each batch does one numpy matmul and emits
  only its local top-k candidates per query; the driver merges candidate
  sets (k × n_batches rows — tiny).  The corpus never shuffles.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  vectors (actor holds the projection matrix); queries search only their
  bucket ± multiprobe flips.  Recall/probe trade-off documented on the fn.
"""

from __future__ import annotations

import heapq
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix_from_list_col(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("ragged embedding column")
    return values.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKPartial:
    """Actor: holds the normalized broadcast query matrix; per batch emits
    the local top-k (query_id, vec_id, cos_sim) candidates."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qmat = q
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _normalize(_matrix_from_list_col(tbl[self.vec_col]))
        ids = tbl[self.id_col].to_pylist()
        sims = self.qmat @ m.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                out_q.append(self.qids[qi])
                out_id.append(ids[j])
                out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_id),
            "cos_sim": pa.array(out_s, type=pa.float64()),
        })


def knn_brute_force(ds, queries, k: int = 10, vec_col: str = "embedding",
                    id_col: str = "vec_id", concurrency=(1, 8)):
    """Exact cosine top-k.  ``queries`` = (query_ids, matrix) tuple.

    Per-batch local top-k (numpy matmul against broadcast queries) → driver
    merge of ≤ k×batches candidates.  Returns a pyarrow Table
    (query_id, vec_id, cos_sim, rank) sorted by (query_id, rank).
    """
    import ray

    qids, qmat = queries
    ref = ray.put((list(qids), np.asarray(qmat, dtype=np.float64)))
    cand = ds.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency,
    ).take_all()
    best: dict = {}
    for row in cand:
        heap = best.setdefault(row["query_id"], [])
        item = (row["cos_sim"], row["vec_id"])
        if len(heap) < k:
            heapq.heappush(heap, item)
        else:
            heapq.heappushpop(heap, item)
    out_q, out_id, out_s, out_r = [], [], [], []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], t[1]))
        for r, (s, vid) in enumerate(ranked, 1):
            out_q.append(qid); out_id.append(vid); out_s.append(s); out_r.append(r)
    return pa.table({
        "query_id": pa.array(out_q),
        "vec_id": pa.array(out_id),
        "cos_sim": pa.array(out_s, type=pa.float64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


class _ExactPairsStage:
    """Actor: batch × broadcast-matrix cosine, emitting (vec_a, vec_b)
    pairs (a < b) with similarity ≥ threshold."""

    def __init__(self, ref, threshold: float, vec_col: str, id_col: str):
        import ray

        ids, mat = ray.get(ref)  # one plasma read per actor
        self.ids = np.asarray(ids)
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))
        self.threshold = threshold
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _normalize(_matrix_from_list_col(tbl[self.vec_col]))
        batch_ids = np.asarray(tbl[self.id_col].to_pylist())
        sims = m @ self.mat.T  # (batch, N)
        ai, bj = np.nonzero(sims >= self.threshold)
        a, b = batch_ids[ai], self.ids[bj]
        keep = a < b  # strict: each global pair counted exactly once
        return pa.table({
            "vec_a": pa.array(a[keep]),
            "vec_b": pa.array(b[keep]),
        })


def near_dup_pairs_exact(ds, threshold: float = 0.5,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         concurrency=(1, 8)):
    """EXACT cosine near-duplicate pairs — the verification path.

    Broadcasts the full normalized matrix (``ray.put`` once, one read per
    actor) and streams batches against it: O(N·batch) per task, no
    shuffle, driver holds only the (rare) matching pairs.  Assumes the
    embedding matrix fits one worker (N×dim float64); above that use
    :func:`cosine_near_dup_pairs` (LSH-bucketed, approximate).
    """
    import ray

    ids, mat = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow"):
        ids.extend(b[id_col].to_pylist())
        mat.append(_matrix_from_list_col(b[vec_col]))
    ref = ray.put((ids, np.vstack(mat) if mat else np.zeros((0, 1))))
    return ds.map_batches(
        _ExactPairsStage,
        fn_constructor_kwargs={"ref": ref, "threshold": threshold,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency,
    )


# ----------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ----------------------------------------------------------------------


class _LshBucket:
    """Actor: random-hyperplane signature per vector (n_bits bucket key)."""

    def __init__(self, planes_ref, vec_col: str, id_col: str):
        import ray

        self.planes = ray.get(planes_ref)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _normalize(_matrix_from_list_col(tbl[self.vec_col]))
        proj = m @ self.planes.T  # (n, bits)
        bits = (proj > 0).astype(np.uint64)
        key = np.zeros(len(m), dtype=np.uint64)
        for b in range(bits.shape[1]):
            key |= bits[:, b] << np.uint64(b)
        out = tbl.append_column("bucket", pa.array(key.view(np.int64), type=pa.int64()))
        return out


def lsh_index(ds, n_bits: int = 12, dim: int = 64, vec_col: str = "embedding",
              id_col: str = "vec_id", seed: int = 11, concurrency=(1, 8)):
    """Assign every vector an ``n_bits`` hyperplane-LSH bucket (adds a
    ``bucket`` column).  Downstream: repartition/write by bucket for
    bucket-local search; expected bucket size = n / 2^bits."""
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    ref = ray.put(planes)
    return ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": ref, "vec_col": vec_col,
                                           "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency,
    ), planes


def cosine_near_dup_pairs(ds, threshold: float = 0.95, n_bits: int = 10,
                          dim: int = 64, vec_col: str = "embedding",
                          id_col: str = "vec_id", seed: int = 11,
                          max_bucket: int = 256):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucketing →
    within-bucket pairwise cosine ≥ ``threshold``.

    Near-identical vectors agree on (almost) every hyperplane sign, so true
    near-dups co-bucket with high probability; expected bucket size
    n/2^bits keeps the in-bucket matmul tiny.  ``max_bucket`` caps
    degenerate buckets (skew guard).  Returns (id_a, id_b, cos_sim).
    """
    import pandas as pd
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    ref = ray.put(planes)
    bucketed = ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": ref,
                                           "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).head(max_bucket)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="float64")})
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in g[vec_col]]))
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        hit = sims[ia, ib] >= threshold
        return pd.DataFrame({
            "id_a": np.minimum(ids[ia[hit]], ids[ib[hit]]),
            "id_b": np.maximum(ids[ia[hit]], ids[ib[hit]]),
            "cos_sim": sims[ia[hit], ib[hit]],
        })

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def knn_lsh(ds, queries, k: int = 10, n_bits: int = 8, dim: int = 64,
            multiprobe: int = 1, vec_col: str = "embedding",
            id_col: str = "vec_id", seed: int = 11):
    """ANN top-k: search only vectors whose LSH bucket is within
    ``multiprobe`` bit-flips of the query's bucket.  Approximate — recall
    grows with ``multiprobe``; exact baseline is :func:`knn_brute_force`."""
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    qids, qmat = queries
    qm = _normalize(np.asarray(qmat, dtype=np.float64))
    qbits = (qm @ planes.T > 0).astype(np.uint64)
    qkeys = np.zeros(len(qm), dtype=np.uint64)
    for b in range(n_bits):
        qkeys |= qbits[:, b] << np.uint64(b)
    probe_sets = []
    for qk in qkeys:
        qk = int(qk)
        probes = {qk}
        if multiprobe >= 1:
            for b in range(n_bits):
                probes.add(qk ^ (1 << b))
        probe_sets.append(probes)
    wanted = set().union(*probe_sets)

    ref_planes = ray.put(planes)
    bucketed = ds.map_batches(
        _LshBucket, fn_constructor_kwargs={"planes_ref": ref_planes,
                                           "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )
    wanted_arr = pa.array(sorted(wanted), type=pa.int64())
    filtered = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted_arr)),
        batch_format="pyarrow",
    )
    return knn_brute_force(filtered, (list(qids), qmat), k=k,
                           vec_col=vec_col, id_col=id_col)
