"""Distributed linear algebra over embedding columns: EXACT fixed-point
covariance and a PCA projection stage built on it.

Reference scope: the reference engine (egze/xema) has no vector-column
math; this is one of the training-data-pipeline extensions (embedding
drift / whitening / dimensionality reduction before clustering or ANN).

Why exact integers: a float covariance is order-of-accumulation
sensitive, so two engines (or two runs over different block splits)
produce different last bits.  Every embedding value is quantized ONCE
as ``q = floor(float64(x) · 10^6)`` and all moments are integer sums:

- ``S_i   = Σ_rows q_i``                      (d int64 values)
- ``M_ij  = Σ_rows q_i · q_j``                (d×d int64 values)
- ``cov_num_ij = n·M_ij − S_i·S_j  = n² · covariance_ij · 10^12``

``cov_num`` is an exact integer — the same associative partials merge
identically on any cluster — and is what the SQL oracle recomputes.
Overflow headroom: |q| ≤ 10^6·|x|; with |x| ≤ 1 and d = 64,
``M_ij`` stays in int64 up to ~9·10^6 rows per PARTIAL and the driver
merge uses Python ints (arbitrary precision), so the global result is
exact at any corpus size; ``n·M`` at 100 TB scales past int64 — the
driver-side Python-int merge is the documented carrier.

Execution shape: one streaming ``map_batches`` pass emitting ONE
(d + d²)-integer partial row per batch (corpus-size-free exchange —
the d×d moment matrix is the whole shuffle payload), driver fold.
PCA then: driver ``eigh`` on the tiny d×d covariance, eigenvectors
broadcast via ``ray.put``, projection is a second stateless
vectorized pass (per-batch matmul) — no shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000


def _quantized_matrix(batch, col: str) -> np.ndarray:
    """list<float> column -> (rows, d) int64 of floor(x·10^6).

    Zero-copy flatten; rows with null embeddings are dropped (the SQL
    twin's ``unnest`` skips them the same way)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // max(len(arr), 1) if len(arr) else 0
    q = np.floor(flat * SCALE).astype(np.int64)
    return q.reshape(len(arr), d) if len(arr) else \
        np.empty((0, 0), np.int64)


def valid_vec_rows(batch: pa.Table, col: str) -> pa.Table:
    """Drop rows whose vector cell is null BEFORE pairing
    :func:`_quantized_matrix` output with id/passthrough columns —
    the matrix silently drops null rows, so an unfiltered batch would
    misalign codes with ids (code-review r3s5, confirmed)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch[col]))
    return batch


def covariance_partials(ds, col: str = "embedding"):
    """One pass -> exact global moments ``(n, S[d], M[d,d])`` with the
    driver fold in Python ints (no int64 overflow at any scale)."""

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized_matrix(batch, col)
        n, d = q.shape
        s = q.sum(axis=0, dtype=np.int64)
        m = q.T @ q  # int64 matmul — exact
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.int64())),
            "m": pa.array([m.reshape(-1).tolist()], pa.list_(pa.int64())),
        })

    n_tot, s_tot, m_tot, d = 0, None, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for row in range(b.num_rows):
            bn = b["n"][row].as_py()
            if not bn:
                continue
            bs = [int(v) for v in b["s"][row].as_py()]
            bm = [int(v) for v in b["m"][row].as_py()]
            if s_tot is None:
                d = len(bs)
                s_tot = [0] * d
                m_tot = [0] * (d * d)
            n_tot += bn
            for i in range(d):
                s_tot[i] += bs[i]
            for i in range(d * d):
                m_tot[i] += bm[i]
    if s_tot is None:
        return 0, [], []
    return n_tot, s_tot, m_tot


def covariance_table(ds, col: str = "embedding") -> pa.Table:
    """Upper-triangle exact covariance numerators:
    ``(i, j, n, cov_num)`` with ``cov_num = n·M_ij − S_i·S_j``
    (int64 at test scales; exact Python ints internally)."""
    n, s, m = covariance_partials(ds, col)
    d = int(len(s))
    ii, jj, cov = [], [], []
    for i in range(d):
        for j in range(i, d):
            ii.append(i)
            jj.append(j)
            cov.append(n * m[i * d + j] - s[i] * s[j])
    return pa.table({
        "i": pa.array(ii, pa.int64()),
        "j": pa.array(jj, pa.int64()),
        "n": pa.array([n] * len(ii), pa.int64()),
        "cov_num": pa.array(cov, pa.int64()),
    })


def pca_components(ds, col: str = "embedding", k: int = 8):
    """Top-``k`` principal axes from the exact covariance.

    Returns ``(mean[d] float64, components[k,d] float64,
    eigvals[k] float64)``.  The eigendecomposition itself is a
    driver-side float op on a d×d matrix (float is fine HERE: the
    inputs to ``eigh`` are already exact, and the result never crosses
    an engine boundary)."""
    n, s, m = covariance_partials(ds, col)
    if n == 0:
        return np.empty(0), np.empty((0, 0)), np.empty(0)
    d = len(s)
    sv = np.array([float(v) for v in s])
    mv = np.array([float(v) for v in m]).reshape(d, d)
    cov = (mv / n - np.outer(sv / n, sv / n)) / (SCALE * SCALE)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    # deterministic sign: largest-|component| entry positive
    comps = v[:, order].T
    for r in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[r]))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    mean = sv / n / SCALE
    return mean, comps, w[order]


class _Project:
    """Stateless projection stage: components read from the object
    store once per actor, one matmul per batch."""

    def __init__(self, params_ref, col: str = "embedding",
                 out_col: str = "pca"):
        import ray

        self.mean, self.comps = ray.get(params_ref)
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = self.comps.shape[1]
        x = flat.reshape(-1, d) - self.mean
        proj = x @ self.comps.T
        return batch.append_column(
            self.out_col,
            pa.array(list(proj), pa.list_(pa.float64())))


def pca_project(ds, col: str = "embedding", k: int = 8,
                out_col: str = "pca", params=None):
    """Append a ``k``-dim PCA projection column.  ``params`` overrides
    the fit with precomputed ``(mean, components)`` (fit once, project
    many corpora)."""
    import ray

    if params is None:
        mean, comps, _ = pca_components(ds, col, k)
    else:
        mean, comps = params
    ref = ray.put((mean, comps))
    return ds.map_batches(
        _Project,
        fn_constructor_kwargs={"params_ref": ref, "col": col,
                               "out_col": out_col},
        batch_format="pyarrow", concurrency=(1, 8))


# ----------------------------------------------------------------------
# scalar quantization (int8 codes for vector search)
# ----------------------------------------------------------------------


def dim_minmax(ds, col: str = "embedding"):
    """Per-dimension (min, max) of the fixed-point values — ONE
    streaming pass emitting a 2×d integer partial row per batch
    (corpus-size-free exchange), driver fold.  Returns (min6, max6)
    int64 arrays of length d."""
    def partial(batch: pa.Table) -> pa.Table:
        q = _quantized_matrix(batch, col)
        if q.size == 0:
            return pa.table({"mn": pa.array([], pa.list_(pa.int64())),
                             "mx": pa.array([], pa.list_(pa.int64()))})
        return pa.table({"mn": pa.array([q.min(axis=0).tolist()]),
                         "mx": pa.array([q.max(axis=0).tolist()])})

    mn = mx = None
    for b in ds.map_batches(partial, batch_format="pyarrow") \
              .iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            bmn = np.asarray(row["mn"], dtype=np.int64)
            bmx = np.asarray(row["mx"], dtype=np.int64)
            mn = bmn if mn is None else np.minimum(mn, bmn)
            mx = bmx if mx is None else np.maximum(mx, bmx)
    if mn is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return mn, mx


class ScalarQuantize:
    """Actor stage: int8-range codes ``q = (x6 − min6)·255 // max(range6,
    1)`` under broadcast per-dim bounds — all-integer, so codes are
    bit-identical on any node/partitioning (a float scale would not
    be).  Emits the code matrix as a ``list<uint8>`` column (4× smaller
    than float32 — the point of quantization: the ANN scan reads codes,
    not floats)."""

    def __init__(self, bounds_ref, col: str = "embedding",
                 out_col: str = "codes"):
        import ray

        self.mn, self.mx = ray.get(bounds_ref) \
            if not isinstance(bounds_ref, tuple) else bounds_ref
        self.rng = np.maximum(self.mx - self.mn, 1)
        self.col, self.out_col = col, out_col

    def codes_of(self, batch: pa.Table) -> np.ndarray:
        q = _quantized_matrix(batch, self.col)
        return ((q - self.mn) * 255 // self.rng).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = valid_vec_rows(batch, self.col)
        codes = self.codes_of(batch)
        keep = [c for c in batch.column_names if c != self.col]
        cols = {c: batch[c] for c in keep}
        cols[self.out_col] = pa.array(list(codes),
                                      type=pa.list_(pa.uint8()))
        return pa.table(cols)


def scalar_quantize(ds, col: str = "embedding", bounds=None,
                    concurrency=(1, 8)):
    """Quantized dataset (``codes`` replaces the float column).  Bounds
    are computed once (:func:`dim_minmax`) and broadcast via
    ``ray.put`` unless supplied."""
    import ray

    if bounds is None:
        bounds = dim_minmax(ds, col)
    ref = ray.put(bounds)
    return ds.map_batches(ScalarQuantize, fn_constructor_args=(ref, col),
                          batch_format="pyarrow",
                          concurrency=concurrency), bounds


def quantize_stats(ds, col: str = "embedding", id_col: str = "vec_id",
                   bounds=None):
    """Per-vector integer code summary ``(id, q_sum, q_min, q_max)`` —
    the SQL-checkable fingerprint of the full code matrix."""
    import ray

    if bounds is None:
        bounds = dim_minmax(ds, col)
    ref = ray.put(bounds)

    class Stats(ScalarQuantize):
        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = valid_vec_rows(batch, col)
            codes = self.codes_of(batch).astype(np.int64)
            if codes.size == 0:
                return pa.table({id_col: batch[id_col],
                                 "q_sum": pa.array([], pa.int64()),
                                 "q_min": pa.array([], pa.int64()),
                                 "q_max": pa.array([], pa.int64())})
            return pa.table({id_col: batch[id_col],
                             "q_sum": pa.array(codes.sum(axis=1)),
                             "q_min": pa.array(codes.min(axis=1)),
                             "q_max": pa.array(codes.max(axis=1))})

    return ds.map_batches(Stats, fn_constructor_args=(ref, col),
                          batch_format="pyarrow", concurrency=(1, 8))
