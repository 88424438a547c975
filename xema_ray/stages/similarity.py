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


def _topk_rows(sims_row: np.ndarray, ids, k: int) -> list:
    """Local top-k row indices under the EXACT global (-cos, id) order —
    a bare argpartition breaks ties at the k boundary arbitrarily
    (identical vectors, i.e. near-duplicates, tie exactly), which makes
    per-batch candidates partitioning-dependent (cf. the PQ
    _local_topk fix).  -inf entries (masked candidates) are excluded."""
    finite = np.nonzero(sims_row > -np.inf)[0]
    if not len(finite):
        return []
    kk = min(k, len(finite))
    s = sims_row[finite]
    if kk < len(finite):
        # O(n) partition, then resolve only the boundary tie class
        # exactly (cf. pq._local_topk)
        part = np.argpartition(-s, kk - 1)
        thresh = s[part[kk - 1]]
        cand = np.nonzero(s >= thresh)[0]
    else:
        cand = np.arange(len(finite))
    id_key = np.asarray(
        [ids[finite[j]] for j in cand],
        dtype=np.int64 if isinstance(ids[finite[0]], (int, np.integer))
        else "U")
    order = finite[cand[np.lexsort((id_key, -s[cand]))]]
    return order[:kk].tolist()


class _TopKPartial:
    """Actor: holds the normalized broadcast query matrix; per batch emits
    the local top-k (query_id, vec_id, cos_sim) candidates."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 allow_ref=None):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qmat = q
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        # optional broadcast allow-list (filtered vector search): the id
        # gate is applied inside the same pass as the matmul — fetched
        # once per actor, never re-shipped per batch
        self.allow = None if allow_ref is None else ray.get(allow_ref)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if self.allow is not None:
            tbl = tbl.filter(pc.is_in(tbl[self.id_col], value_set=self.allow))
        if tbl.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.array(self.qids).type),
                "vec_id": pa.array([], type=tbl.schema.field(self.id_col).type),
                "cos_sim": pa.array([], type=pa.float64()),
            })
        m = _normalize(_matrix_from_list_col(tbl[self.vec_col]))
        ids = tbl[self.id_col].to_pylist()
        sims = self.qmat @ m.T  # (n_queries, n_batch)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in _topk_rows(sims[qi], ids, self.k):
                out_q.append(self.qids[qi])
                out_id.append(ids[j])
                out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_id),
            "cos_sim": pa.array(out_s, type=pa.float64()),
        })


class _RevOrd:
    """Total-order inversion wrapper so the min-heap's eviction root is
    (lowest cos, LARGEST id) — a plain (cos, id) key evicted the
    SMALLEST id inside a boundary tie class, the opposite of the
    (-cos, id asc) ranking contract (code-review r3s5, reproduced with
    identical vectors); works for int and string ids alike."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _merge_topk(cand_rows, k: int) -> pa.Table:
    """Driver-side merge of per-batch candidate rows into global top-k per
    query (count-bounded heaps), shared by the brute-force and IVF paths —
    single source of truth for the (-cos, vec_id) tie-break and ranking."""
    best: dict = {}
    for row in cand_rows:
        heap = best.setdefault(row["query_id"], [])
        item = (row["cos_sim"], _RevOrd(row["vec_id"]))
        if len(heap) < k:
            heapq.heappush(heap, item)
        else:
            heapq.heappushpop(heap, item)
    out_q, out_id, out_s, out_r = [], [], [], []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], t[1].v))
        for r, (sc, vid) in enumerate(ranked, 1):
            out_q.append(qid); out_id.append(vid.v); out_s.append(sc); out_r.append(r)
    return pa.table({
        "query_id": pa.array(out_q),
        "vec_id": pa.array(out_id),
        "cos_sim": pa.array(out_s, type=pa.float64()),
        "rank": pa.array(out_r, type=pa.int64()),
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
    return _merge_topk(cand, k)


def knn_filtered(ds, keep_ids, queries, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 concurrency=(1, 8)):
    """Predicate-FILTERED exact kNN (filtered vector search): restrict
    the corpus to an allow-list of ids derived from a metadata gate
    (e.g. a document-quality predicate), then cosine top-k over the
    survivors.  ``keep_ids`` = array-like of ids that pass the gate.

    Scale shape: the allow-list is broadcast ONCE via ``ray.put`` (ids
    only — 8 B/doc, ~1 GB per 10^8 gated docs) and each actor fetches
    it once in ``__init__``; the gate mask and the matmul run in the
    SAME pass, so no embedding payload moves and the corpus streams
    through exactly once.  For allow-lists too large to broadcast
    (≳10^9 survivors) semi-join the gate side instead with the native
    hash-partitioned ``Dataset.join`` and feed :func:`knn_brute_force`.
    """
    import ray

    qids, qmat = queries
    qref = ray.put((list(qids), np.asarray(qmat, dtype=np.float64)))
    keep = (keep_ids if isinstance(keep_ids, (pa.Array, pa.ChunkedArray))
            else pa.array(keep_ids))
    aref = ray.put(keep)
    cand = ds.map_batches(
        _TopKPartial,
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "vec_col": vec_col, "id_col": id_col,
                               "allow_ref": aref},
        batch_format="pyarrow", concurrency=concurrency,
    ).take_all()
    return _merge_topk(cand, k)


class _TopKPerLabel:
    """Actor: per batch, cosine top-k per query restricted by label —
    ``match="same"`` keeps the query's own partition (partitioned
    search), ``match="different"`` keeps only CROSS-label rows
    (hard-negative mining).  The mask is applied to the sim matrix
    BEFORE the top-k cut, so the restriction costs one fused pass."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 label_col: str, match: str = "same"):
        import ray

        self.qids, qmat, qlabels = ray.get(queries_ref)
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.qlabels = np.asarray(qlabels, dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.label_col = label_col
        self.match = match

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _normalize(_matrix_from_list_col(tbl[self.vec_col]))
        ids = tbl[self.id_col].to_pylist()
        labels = tbl[self.label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = self.qmat @ m.T  # (n_queries, n_batch)
        if self.match == "same":
            sims[self.qlabels[:, None] != labels[None, :]] = -np.inf
        else:                     # "different": cross-label candidates only
            sims[self.qlabels[:, None] == labels[None, :]] = -np.inf
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in _topk_rows(sims[qi], ids, self.k):
                out_q.append(self.qids[qi])
                out_id.append(ids[j])
                out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "cos_sim": pa.array(out_s, type=pa.float64()),
        })


def knn_per_label(ds, queries, k: int = 10, vec_col: str = "embedding",
                  id_col: str = "vec_id", label_col: str = "label",
                  concurrency=(1, 8)):
    """Label-PARTITIONED exact kNN: each query searches only vectors
    sharing its label.  ``queries`` = (ids, matrix, labels).

    Same shape as :func:`knn_brute_force` — broadcast query tuple, one
    matmul per batch, local top-k, driver candidate merge — with the
    label restriction fused into the sim matrix as a −inf mask, so the
    partition filter is free (no extra pass, no data movement).  With a
    label-partitioned PARQUET layout the read itself would prune
    non-matching partitions and this stage is unchanged.
    """
    return _knn_label_restricted(ds, queries, k, vec_col, id_col,
                                 label_col, "same", concurrency)


def _knn_label_restricted(ds, queries, k, vec_col, id_col, label_col,
                          match, concurrency):
    import ray

    qids, qmat, qlabels = queries
    ref = ray.put((list(qids), np.asarray(qmat, dtype=np.float64),
                   list(qlabels)))
    cand = ds.map_batches(
        _TopKPerLabel,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "vec_col": vec_col, "id_col": id_col,
                               "label_col": label_col, "match": match},
        batch_format="pyarrow", concurrency=concurrency,
    ).take_all()
    return _merge_topk(cand, k)


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
                          max_bucket: int = 256, n_tables: int = 1):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucketing →
    within-bucket pairwise cosine ≥ ``threshold`` (exact verification).

    ``n_tables=1`` (default): near-identical vectors agree on (almost)
    every hyperplane sign, so true near-dups co-bucket with high
    probability — right for high thresholds (≥0.9).  ``n_tables>1`` is
    the amplified OR-construction for moderate thresholds: a pair is a
    candidate if it co-buckets in ANY of the L independent tables
    (recall ≈ 1-(1-p^b)^L with p = 1-θ/π), and because every candidate
    is verified with exact in-bucket cosine, the output is a subset of
    the exact pair set — equal to it whenever recall covers every true
    pair.  The per-vector shuffle rider is L×(id + bucket + vector);
    pairs found in several tables are deduped with one pair-key groupby
    (pairs are rare by assumption, so that exchange is tiny).

    Expected bucket size n/2^bits keeps the in-bucket matmul tiny;
    ``max_bucket`` caps degenerate buckets (skew guard).
    Returns (id_a, id_b, cos_sim).
    """
    import pandas as pd
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    ref = ray.put(planes)

    class BucketTables:
        """Emit one (bucket=table<<bits|key, id, vec) row per table."""

        def __init__(self):
            self.planes = ray.get(ref)  # (L, bits, dim)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            m = _normalize(_matrix_from_list_col(tbl[vec_col]))
            n = len(m)
            L = self.planes.shape[0]
            keys = np.empty((L, n), dtype=np.uint64)
            for t in range(L):
                bits = (m @ self.planes[t].T > 0).astype(np.uint64)
                key = np.zeros(n, dtype=np.uint64)
                for b in range(bits.shape[1]):
                    key |= bits[:, b] << np.uint64(b)
                keys[t] = (np.uint64(t) << np.uint64(n_bits)) | key
            vecs = tbl[vec_col]
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            idx = pa.array(np.tile(np.arange(n), L))
            return pa.table({
                "bucket": pa.array(keys.reshape(-1).view(np.int64),
                                   type=pa.int64()),
                id_col: tbl[id_col].take(idx),
                vec_col: vecs.take(idx),
            })

    bucketed = ds.map_batches(BucketTables, batch_format="pyarrow",
                              concurrency=(1, 8))

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

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pandas")
    if n_tables == 1:
        # each vector lives in exactly ONE bucket, so a pair can only be
        # emitted from the single bucket both occupy — no cross-bucket
        # duplicates, no dedup shuffle needed
        return pairs

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(
        first_row, batch_format="pandas")


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
    import itertools

    flips = [0]
    for d in range(1, min(multiprobe, n_bits) + 1):
        for bits in itertools.combinations(range(n_bits), d):
            mask = 0
            for b in bits:
                mask |= 1 << b
            flips.append(mask)
    wanted = {int(qk) ^ m for qk in qkeys for m in flips}

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


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: distributed k-means coarse quantizer + nprobe
# ----------------------------------------------------------------------


def _kmeans_partial_batch(tbl: pa.Table, cent_ref, vec_col: str) -> pa.Table:
    """TASK-pool stage: assign each batch row to its nearest centroid and
    emit the per-centroid (sum, count) partial — one tiny row per batch.
    A task, not an actor, because the loop below re-broadcasts new
    centroids EVERY iteration: an actor pool would respawn per iteration
    (~1.5 s each on this box — the pq_fit lesson, stages/pq.py), while a
    per-task ``ray.get`` of the plasma-shared matrix is a zero-copy local
    read."""
    import pickle

    import ray

    cent = ray.get(cent_ref)
    m = _normalize(_matrix_from_list_col(tbl[vec_col]))
    assign = (m @ cent.T).argmax(axis=1)
    k, d = cent.shape
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, m)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return pa.table({
        "partial": pa.array([pickle.dumps((sums, counts))], type=pa.binary()),
    })


def kmeans_fit(ds, k: int = 64, iters: int = 5, vec_col: str = "embedding",
               seed: int = 17, sample: int = 4096):
    """Distributed Lloyd iterations for the IVF coarse quantizer.

    Shuffle-free: each iteration broadcasts the (k, d) centroid matrix
    (``ray.put``) and streams the corpus through an assignment +
    partial-sum stage; the driver folds one tiny (k·d sums, k counts)
    partial per batch.  Init = spherical k-means on a driver-side sample.
    Returns the (k, d) L2-normalized centroid matrix.
    """
    import pickle

    import ray

    # init from a bounded sample (first `sample` rows — the corpus is
    # unordered synthetic/shard data; kmeans++ refinement not needed for a
    # coarse quantizer)
    head = ds.limit(sample).take_all()
    mat = _normalize(np.asarray([r[vec_col] for r in head], dtype=np.float64))
    rng = np.random.default_rng(seed)
    k = min(k, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)]

    for _ in range(iters):
        ref = ray.put(cent)
        rows = ds.map_batches(
            lambda t, ref=ref: _kmeans_partial_batch(t, ref, vec_col),
            batch_format="pyarrow",
        ).take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            s, c = pickle.loads(r["partial"])
            sums += s
            counts += c
        nonempty = counts > 0
        cent[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
        # dead centroids re-seed from the sample (keeps k lists populated)
        for i in np.nonzero(~nonempty)[0]:
            cent[i] = mat[rng.integers(len(mat))]
    return cent


def ivf_index(ds, centroids: np.ndarray, vec_col: str = "embedding",
              concurrency=(1, 8)):
    """Assign every vector its inverted-list id (argmax-cosine centroid) —
    the reusable partitioning key for IVF search / clustering exports."""
    import ray

    ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            m = _normalize(_matrix_from_list_col(tbl[vec_col]))
            lid = (m @ self.cent.T).argmax(axis=1).astype(np.int32)
            return tbl.append_column("list_id", pa.array(lid, type=pa.int32()))

    return ds.map_batches(Assign, batch_format="pyarrow",
                          concurrency=concurrency)


def knn_ivf(ds, queries, centroids: np.ndarray, k: int = 10, nprobe: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id",
            concurrency=(1, 8)):
    """IVF approximate top-k: each query probes its ``nprobe`` nearest
    inverted lists; batches compute similarities only for rows whose
    ``list_id`` is probed by some query (the corpus streams once, no
    shuffle; candidate volume ≈ nprobe/k_lists of the corpus).

    ``ds`` may be raw (indexed on the fly) or already carry ``list_id``
    from :func:`ivf_index`.  Returns (query_id, vec_id, cos_sim, rank).
    """
    import ray

    if "list_id" not in ds.schema().names:
        ds = ivf_index(ds, centroids, vec_col=vec_col, concurrency=concurrency)

    qids, qmat = queries
    qn = _normalize(np.asarray(qmat, dtype=np.float64))
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((list(qids), qn, probes))

    class Probe:
        def __init__(self):
            self.qids, self.qn, self.probes = ray.get(ref)
            self.k = k
            # probed-list → query rows lookup
            self.by_list: dict = {}
            for qi, lists in enumerate(self.probes):
                for l in lists:
                    self.by_list.setdefault(int(l), []).append(qi)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            lids = tbl["list_id"].to_numpy(zero_copy_only=False)
            mask = np.isin(lids, np.fromiter(self.by_list, dtype=np.int64))
            out_q, out_id, out_s = [], [], []
            if mask.any():
                sub = tbl.filter(pa.array(mask))
                m = _normalize(_matrix_from_list_col(sub[vec_col]))
                ids = sub[id_col].to_pylist()
                sub_lids = lids[mask]
                sims = self.qn @ m.T  # (nq, n_sub)
                for qi in range(len(self.qids)):
                    probed = np.isin(sub_lids, self.probes[qi])
                    # mask to -inf so the shared exact-tie local top-k
                    # applies (argpartition alone broke boundary ties)
                    row = np.where(probed, sims[qi], -np.inf)
                    for j in _topk_rows(row, ids, self.k):
                        out_q.append(self.qids[qi])
                        out_id.append(ids[int(j)])
                        out_s.append(float(sims[qi, j]))
            return pa.table({
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            })

    cand = ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=concurrency).take_all()
    return _merge_topk(cand, k)


def kmeans_clusters(ds, k: int = 8, iters: int = 3, seed: int = 17,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Unsupervised clustering rollup: Lloyd fit (:func:`kmeans_fit`,
    shuffle-free broadcast iterations) + ONE assignment pass emitting
    per-cluster INTEGER partials ``(cluster, n, id_sum)`` — exact
    content fingerprints (the id sum pins which vectors landed where,
    not just how many), so the result is reproducible bit-for-bit at
    any parallelism.  The only exchange is the k-row partial groupby.
    """
    import ray
    from ray.data.aggregate import Sum

    cent = kmeans_fit(ds, k=k, iters=iters, seed=seed, vec_col=vec_col)
    ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_matrix_from_list_col(t[vec_col]))
        lab = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({
            "cluster": pa.array(lab),
            "n": pa.array(np.ones(len(lab), np.int64)),
            "id_sum": pa.array(t[id_col].to_numpy().astype(np.int64)),
        }).group_by("cluster").aggregate([("n", "sum"), ("id_sum", "sum")])

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("cluster").aggregate(
            Sum("n_sum", alias_name="n"),
            Sum("id_sum_sum", alias_name="id_sum"))


def mmr_topk(ds, queries, k: int = 5, pool: int = 25, lam: float = 0.7,
             vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency=(1, 8)) -> pa.Table:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): rerank each query's brute-force candidate POOL so
    near-duplicate hits don't crowd the result —
    ``argmax λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)``.

    Scale shape: the distributed work is the existing pooled kNN scan
    (per-batch local top-k, driver merges ≤ pool×batches rows); the
    candidate VECTORS are then gathered with one broadcast-id filter
    pass (O(queries×pool) rows — driver-sized by construction) and the
    k-step greedy runs on the driver over that tiny pool.  Scores are
    quantized to 10^-6 fixed point with an id tie-break, so selection
    is deterministic on any partitioning.
    """
    import ray

    import pyarrow.compute as pc

    qids, qmat = queries
    base = knn_brute_force(ds, queries, k=pool, vec_col=vec_col,
                           id_col=id_col, concurrency=concurrency)
    cand_ids = pc.unique(base["vec_id"])
    ids_ref = ray.put(cand_ids)

    def gather(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[id_col], value_set=ray.get(ids_ref))
        return t.filter(keep).select([id_col, vec_col])

    rows = ds.map_batches(gather, batch_format="pyarrow").take_all()
    vecs = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64)
            for r in rows}

    def fp(x: float) -> int:
        return int(np.floor(x * 1e6))

    out_q, out_id, out_r, out_m = [], [], [], []
    qarr = _normalize(np.asarray(qmat, dtype=np.float64))
    pool_by_q: dict = {}
    for r in base.to_pylist():
        pool_by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for qi, qid in enumerate(qids):
        ids = pool_by_q.get(qid, [])
        raw = np.stack([vecs[i] for i in ids]) if ids else np.zeros((0, 1))
        mat = _normalize(raw) if ids else np.zeros((0, 1))
        rel = mat @ qarr[qi] if ids else np.zeros(0)
        # bitwise-identical vectors get cosine EXACTLY 1: the
        # normalize-then-dot float path loses it to rounding (1-1ulp)
        # while the mathematical value — and SQL's ratio form — is 1.0
        qraw = np.asarray(qmat[qi], dtype=np.float64)
        if ids and raw.shape[1] == qraw.shape[0]:
            rel[np.all(raw == qraw, axis=1)] = 1.0
        selected: list = []
        remaining = list(range(len(ids)))
        while remaining and len(selected) < k:
            best, best_key = None, None
            for j in remaining:
                div = max((1.0 if np.array_equal(raw[j], raw[s])
                           else float(mat[j] @ mat[s]) for s in selected),
                          default=0.0)
                score = fp(lam * float(rel[j]) - (1 - lam) * div)
                key = (-score, ids[j])
                if best_key is None or key < best_key:
                    best, best_key = j, key
            selected.append(best)
            remaining.remove(best)
            out_q.append(qid)
            out_id.append(ids[best])
            out_r.append(len(selected))
            out_m.append(-best_key[0])
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_id, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "mmr_m": pa.array(out_m, pa.int64())})


def hard_negatives(ds, queries, k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", label_col: str = "label",
                   concurrency=(1, 8)):
    """HARD-NEGATIVE mining for contrastive/embedding training: per
    query, the nearest vectors whose label DIFFERS — the highest-
    similarity wrong-class examples a triplet/InfoNCE loss trains
    against.  Identical shape to :func:`knn_per_label` with the mask
    inverted (cross-label candidates only), so the mining pass costs
    one fused matmul scan."""
    return _knn_label_restricted(ds, queries, k, vec_col, id_col,
                                 label_col, "different", concurrency)


def semantic_dedup(ds, k: int = 8, iters: int = 3, seed: int = 17,
                   tau: float = 0.5, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """SemDeDup (Abbas et al. 2023, public arXiv 2303.09540): semantic
    near-duplicate detection with K-MEANS BLOCKING — the third blocking
    strategy next to LSH (:func:`cosine_near_dup_pairs`) and the exact
    broadcast scan (:func:`near_dup_pairs_exact`).

    Pipeline: shuffle-free Lloyd fit (broadcast centroids), one
    assignment pass, then ONE cluster exchange co-locating each
    cluster's vectors; inside a cluster the dominance rule drops every
    vector that has cosine >= tau with a LOWER-id member — order-free
    (no greedy sequence), so the result is partition-invariant and
    SQL-recomputable.  Per-cluster work is O(|cluster|^2·d) matmul;
    pick k ~ sqrt(N/target_cluster_rows) at scale (the paper uses
    ~sqrt N clusters at LAION scale) so a cluster fits one task.

    Returns the DROPPED rows ``(vec_id, cluster, dup_of)`` where
    ``dup_of`` is the smallest dominating id — the removal manifest
    (join back to the corpus to filter, same shape as exact dedup).
    """
    import pandas as pd
    import ray

    cent = kmeans_fit(ds, k=k, iters=iters, seed=seed, vec_col=vec_col)
    ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        t = t.filter(pc.is_valid(t[vec_col]))
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             vec_col: pa.array([], t.schema.field(
                                 vec_col).type)})
        m = _normalize(_matrix_from_list_col(t[vec_col]))
        lab = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "cluster": pa.array(lab),
            vec_col: t[vec_col],
        })

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow")

    def dominated(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_numpy()
        m = _normalize(np.asarray(
            [np.asarray(v, dtype=np.float64) for v in g[vec_col]]))
        sim = m @ m.T
        # strictly-lower-id dominance: mask the diagonal and upper tri
        hit = np.tril(sim >= tau, k=-1)
        rows = np.where(hit.any(axis=1))[0]
        dup_of = np.array([ids[np.argmax(hit[i])] for i in rows],
                          dtype=np.int64)
        return pd.DataFrame({
            id_col: ids[rows],
            "cluster": g["cluster"].to_numpy()[rows],
            "dup_of": dup_of,
        })

    return assigned.groupby("cluster").map_groups(
        dominated, batch_format="pandas")
