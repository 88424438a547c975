"""Exact covariance + PCA (stages/linalg.py) and feature hashing."""

import hashlib

import numpy as np
import pyarrow as pa


def _emb_ds(x, ids=None):
    import ray.data as rd

    n = len(x)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids if ids is not None else range(n),
                           pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32())),
    })).repartition(3)


def test_covariance_matches_numpy_exact(ray_session):
    from xema_ray.stages.linalg import SCALE, covariance_table

    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    got = covariance_table(_emb_ds(x)).to_pandas()
    q = np.floor(x.astype(np.float64) * SCALE).astype(object)
    n = len(x)
    s = q.sum(axis=0)
    m = q.T @ q
    for _, r in got.iterrows():
        i, j = int(r["i"]), int(r["j"])
        assert int(r["cov_num"]) == n * m[i, j] - s[i] * s[j]
        assert int(r["n"]) == n
    assert len(got) == 5 * 6 // 2


def test_covariance_split_invariance(ray_session):
    # associative partials: different block splits, identical result
    from xema_ray.stages.linalg import covariance_table

    rng = np.random.default_rng(3)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    a = covariance_table(_emb_ds(x).repartition(1)).to_pandas()
    b = covariance_table(_emb_ds(x).repartition(7)).to_pandas()
    assert a.equals(b)


def test_pca_matches_numpy(ray_session):
    from xema_ray.stages.linalg import pca_components

    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated along a known axis
    base = rng.normal(size=(200, 6)) * np.array([5, 2, 1, .5, .2, .1])
    x = base.astype(np.float32)
    mean, comps, w = pca_components(_emb_ds(x), k=3)
    xq = np.floor(x.astype(np.float64) * 1e6) / 1e6
    ref_cov = np.cov(xq, rowvar=False, bias=True)
    rw, rv = np.linalg.eigh(ref_cov)
    order = np.argsort(rw)[::-1][:3]
    assert np.allclose(sorted(w, reverse=True),
                       sorted(rw[order], reverse=True), rtol=1e-9)
    for r in range(3):
        ref = rv[:, order[r]]
        # sign-normalized comparison
        assert np.allclose(np.abs(comps[r] @ ref), 1.0, atol=1e-9)


def test_pca_project_shapes_and_variance(ray_session):
    from xema_ray.stages.linalg import pca_project

    rng = np.random.default_rng(5)
    x = (rng.normal(size=(120, 8)) *
         np.array([4, 3, 2, 1, .1, .1, .1, .1])).astype(np.float32)
    out = pca_project(_emb_ds(x), k=2)
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    proj = np.array(tbl["pca"].to_pylist())
    assert proj.shape == (120, 2)
    # first axis carries the most variance
    v = proj.var(axis=0)
    assert v[0] > v[1] > 0


def test_feature_hash_matches_brute(ray_session):
    import ray.data as rd

    from xema_ray.stages.text import feature_hash_counts

    docs = [("a", "apple banana apple"), ("b", ""), ("c", None),
            ("d", "Zoo zoo 42 zoo!")]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.string()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    got = feature_hash_counts(ds, buckets=16).to_pandas() \
        .sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    import re

    want = {}
    for doc_id, t in docs:
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            b = int(hashlib.md5(w.encode()).hexdigest()[0], 16) % 16
            want[(doc_id, b)] = want.get((doc_id, b), 0) + 1
    assert [(r["doc_id"], r["bucket"], r["cnt"])
            for _, r in got.iterrows()] == \
        sorted((d, b, c) for (d, b), c in want.items())


def test_kmeans_clusters_partition_and_determinism(ray_session):
    from xema_ray.stages.similarity import kmeans_clusters

    rng = np.random.default_rng(2)
    x = rng.normal(size=(90, 6)).astype(np.float32)
    ds = _emb_ds(x)
    a = kmeans_clusters(ds, k=4, iters=2, seed=5).take_all()
    b = kmeans_clusters(_emb_ds(x).repartition(5), k=4, iters=2,
                        seed=5).take_all()
    key = lambda rows: sorted((r["cluster"], r["n"], r["id_sum"])
                              for r in rows)
    assert key(a) == key(b)
    # every vector in exactly one cluster: sizes and id sums partition
    assert sum(r["n"] for r in a) == 90
    assert sum(r["id_sum"] for r in a) == sum(range(90))
