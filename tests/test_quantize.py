"""Scalar quantization (linalg.dim_minmax / ScalarQuantize) — exactness,
partitioning invariance, and quantized-search recall."""

import numpy as np
import pyarrow as pa
import pytest

from xema_ray.stages.linalg import SCALE, dim_minmax, quantize_stats, \
    scalar_quantize


def _emb_ds(mat, ids=None, blocks=4):
    import ray.data as rd

    ids = list(range(len(mat))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32()))}),
        override_num_blocks=blocks)


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


@pytest.mark.usefixtures("ray_session")
class TestScalarQuantize:
    def test_bounds_and_codes_exact(self):
        mat = np.array([[0.0, -1.0], [1.0, 1.0], [0.5, 0.0]])
        ds = _emb_ds(mat, blocks=3)
        mn, mx = dim_minmax(ds)
        assert mn.tolist() == [0, -SCALE]
        assert mx.tolist() == [SCALE, SCALE]
        qds, _ = scalar_quantize(ds)
        out = _collect(qds).sort_by("vec_id")
        codes = out["codes"].to_pylist()
        # dim0: (x6-0)*255//1e6 ; dim1: (x6+1e6)*255//2e6
        assert codes[0] == [0, 0]
        assert codes[1] == [255, 255]
        assert codes[2] == [127, 127]

    def test_partitioning_invariance(self):
        rng = np.random.default_rng(3)
        mat = rng.standard_normal((200, 16)).astype(np.float32)
        a = _collect(quantize_stats(_emb_ds(mat, blocks=2))) \
            .sort_by("vec_id")
        b = _collect(quantize_stats(_emb_ds(mat, blocks=13))) \
            .sort_by("vec_id")
        assert a.equals(b)

    def test_quantized_search_recall(self):
        """Top-10 by quantized-code dot vs exact float dot: recall ≥ 0.8
        on gaussian data (the scan-compression contract)."""
        rng = np.random.default_rng(11)
        base = rng.standard_normal((400, 32)).astype(np.float32)
        query = rng.standard_normal(32).astype(np.float32)
        ds = _emb_ds(base, blocks=5)
        qds, (mn, mx) = scalar_quantize(ds)
        out = _collect(qds).sort_by("vec_id")
        codes = np.array(out["codes"].to_pylist(), dtype=np.float64)
        # dequantize approximately and rank
        rngs = np.maximum(mx - mn, 1).astype(np.float64)
        approx = (codes * rngs / 255.0 + mn) / SCALE
        exact_top = set(np.argsort(-(base.astype(np.float64) @ query))[:10])
        quant_top = set(np.argsort(-(approx @ query))[:10])
        assert len(exact_top & quant_top) >= 8

    def test_constant_dim_range_guard(self):
        mat = np.array([[1.0, 2.0], [1.0, 5.0]])
        qds, _ = scalar_quantize(_emb_ds(mat, blocks=1))
        codes = _collect(qds).sort_by("vec_id")["codes"].to_pylist()
        assert [c[0] for c in codes] == [0, 0]  # zero-range dim → 0
        assert [c[1] for c in codes] == [0, 255]


@pytest.mark.usefixtures("ray_session")
class TestProductQuantization:
    def _clustered(self, n=240, d=8, m=2, seed=5):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((4, d)) * 3
        mat = centers[rng.integers(0, 4, n)] + \
            rng.standard_normal((n, d)) * 0.05
        return mat.astype(np.float32)

    def test_fit_partitioning_invariant(self):
        from xema_ray.stages.pq import pq_fit

        mat = self._clustered()
        a = pq_fit(_emb_ds(mat, blocks=2), m=2, k=4, iters=3, seed=1)
        b = pq_fit(_emb_ds(mat, blocks=9), m=2, k=4, iters=3, seed=1)
        assert np.array_equal(a, b)

    def test_encode_reconstruction_beats_random(self):
        from xema_ray.stages.pq import PqEncode, pq_encode, pq_fit

        mat = self._clustered()
        ds = _emb_ds(mat, blocks=3)
        cb = pq_fit(ds, m=2, k=4, iters=3, seed=1)
        out = _collect(pq_encode(ds, cb)).sort_by("vec_id")
        codes = np.array(out["pq_code"].to_pylist())
        assert codes.shape == (len(mat), 2)
        # reconstruct from codebooks and compare distortion to the data
        # scale: clustered data must reconstruct tightly
        q6 = np.floor(mat.astype(np.float64) * 1e6).astype(np.int64)
        rec = np.concatenate(
            [cb[j][codes[:, j]] for j in range(2)], axis=1)
        err = np.linalg.norm(q6 - rec)
        # must beat the degenerate one-centroid codebook (global mean)
        err_mean = np.linalg.norm(q6 - q6.mean(axis=0, keepdims=True))
        assert err < 0.6 * err_mean

    def test_assign_tie_goes_to_lowest_index(self):
        from xema_ray.stages.pq import _assign

        sub = np.array([[0, 0]], dtype=np.int64)
        cb = np.array([[2, 0], [-2, 0], [0, 2]], dtype=np.int64)
        assert _assign(sub, cb).tolist() == [0]

    def test_dim_not_divisible_raises(self):
        from xema_ray.stages.pq import _sub_views

        with pytest.raises(ValueError):
            _sub_views(np.zeros((1, 10), dtype=np.int64), 4)

    def test_cell_stats_fingerprint(self):
        from xema_ray.stages.pq import pq_cell_stats, pq_encode, pq_fit

        mat = self._clustered(n=100)
        ds = _emb_ds(mat, blocks=4)
        cb = pq_fit(ds, m=2, k=4, iters=2, seed=2)
        cells = pq_cell_stats(ds, cb)
        codes = np.array(_collect(pq_encode(ds, cb)).sort_by("vec_id")
                         ["pq_code"].to_pylist())
        for r in cells.to_pylist():
            members = np.nonzero(codes[:, r["subspace"]]
                                 == r["centroid"])[0]
            assert r["n"] == len(members)
            assert r["id_sum"] == int(members.sum())


@pytest.mark.usefixtures("ray_session")
class TestAdcSearch:
    def test_recall_vs_exact(self):
        from xema_ray.stages.pq import knn_pq, pq_encode, pq_fit

        rng = np.random.default_rng(9)
        base = rng.standard_normal((300, 16)).astype(np.float32)
        ds = _emb_ds(base, blocks=5)
        cb = pq_fit(ds, m=4, k=16, iters=3, seed=3)
        q = base[:3]
        out = knn_pq(pq_encode(ds, cb), ([0, 1, 2], q), cb, k=10,
                     code_col="pq_code")
        # exact Euclidean top-10 in the same fixed-point space
        q6 = np.floor(base.astype(np.float64) * 1e6).astype(np.int64)
        hits = 0
        for qi in range(3):
            d = ((q6 - q6[qi]) ** 2).sum(axis=1)
            exact = set(np.argsort(d, kind="stable")[:10].tolist())
            got = {r["vec_id"] for r in out.to_pylist()
                   if r["query_id"] == qi}
            assert qi in got  # the query itself is its own nearest
            hits += len(exact & got)
        assert hits / 30 >= 0.5  # coarse codes, but far above random

    def test_code_scan_equals_fly_encode(self):
        from xema_ray.stages.pq import knn_pq, pq_encode, pq_fit

        rng = np.random.default_rng(4)
        base = rng.standard_normal((120, 8)).astype(np.float32)
        ds = _emb_ds(base, blocks=3)
        cb = pq_fit(ds, m=2, k=8, iters=2, seed=1)
        q = ([0], base[:1])
        a = knn_pq(pq_encode(ds, cb), q, cb, k=5, code_col="pq_code")
        b = knn_pq(ds, q, cb, k=5)          # encodes floats on the fly
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestIvfPq:
    def test_pruned_subset_of_full_adc_lists(self):
        from xema_ray.stages.pq import (_assign, ivf_coarse_fit, knn_ivfpq,
                                        pq_fit)

        rng = np.random.default_rng(21)
        base = rng.standard_normal((400, 16)).astype(np.float32)
        ds = _emb_ds(base, blocks=6)
        coarse = ivf_coarse_fit(ds, nlist=8, iters=2, seed=1)
        cb = pq_fit(ds, m=4, k=8, iters=2, seed=2)
        out = knn_ivfpq(ds, ([0, 1], base[:2]), coarse, cb,
                        k=10, nprobe=3)
        # every returned vector must belong to a probed list
        q6 = np.floor(base.astype(np.float64) * 1e6).astype(np.int64)
        lists = _assign(q6, coarse)
        d2 = ((q6[:2, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
        for qi in (0, 1):
            probed = set(np.argsort(d2[qi], kind="stable")[:3].tolist())
            got = [r["vec_id"] for r in out.to_pylist()
                   if r["query_id"] == qi]
            assert len(got) == 10
            assert all(lists[v] in probed for v in got)
            assert qi in got  # query's own list is always probed first

    def test_full_probe_equals_plain_adc(self):
        from xema_ray.stages.pq import (ivf_coarse_fit, knn_ivfpq, knn_pq,
                                        pq_fit)

        rng = np.random.default_rng(22)
        base = rng.standard_normal((150, 8)).astype(np.float32)
        ds = _emb_ds(base, blocks=4)
        coarse = ivf_coarse_fit(ds, nlist=4, iters=2, seed=5)
        cb = pq_fit(ds, m=2, k=8, iters=2, seed=6)
        q = ([0], base[:1])
        a = knn_ivfpq(ds, q, coarse, cb, k=8, nprobe=4)  # probe ALL lists
        b = knn_pq(ds, q, cb, k=8)
        assert a.equals(b)


class TestLocalTopk:
    def test_tie_at_k_boundary(self):
        from xema_ray.stages.pq import _local_topk

        # the review repro: a distance tie spanning the k boundary must
        # resolve by id, not by argpartition's arbitrary pick
        dist = np.array([5, 5, 5, 9], dtype=np.int64)
        ids = np.array([30, 10, 20, 1], dtype=np.int64)
        sel = _local_topk(dist, ids, 2)
        assert ids[sel].tolist() == [10, 20]

    def test_all_tied(self):
        from xema_ray.stages.pq import _local_topk

        dist = np.zeros(6, dtype=np.int64)
        ids = np.array([5, 3, 9, 1, 7, 2], dtype=np.int64)
        assert ids[_local_topk(dist, ids, 3)].tolist() == [1, 2, 3]

    def test_k_larger_than_n(self):
        from xema_ray.stages.pq import _local_topk

        dist = np.array([2, 1], dtype=np.int64)
        ids = np.array([8, 9], dtype=np.int64)
        assert ids[_local_topk(dist, ids, 10)].tolist() == [9, 8]


@pytest.mark.usefixtures("ray_session")
class TestMmr:
    def test_diversifies_clustered_pool(self):
        from xema_ray.stages.similarity import mmr_topk

        rng = np.random.default_rng(31)
        # two tight clusters near the query; plain kNN fills top-4 from
        # the closer cluster, MMR must alternate
        q = np.array([1.0] + [0.0] * 7)
        a = q + rng.standard_normal((20, 8)) * 0.01          # cluster A
        # cluster B: cos ~0.78 to q, so the pool (25 > |A|) holds both
        b = q + 0.8 * np.roll(q, 1) \
            + rng.standard_normal((20, 8)) * 0.01
        base = np.vstack([a, b]).astype(np.float32)
        ds = _emb_ds(base, blocks=4)
        out = mmr_topk(ds, ([0], q[None, :]), k=4, pool=25, lam=0.3)
        got = out["vec_id"].to_pylist()
        assert len(got) == 4
        # diversity-heavy lambda must pull from the far cluster
        # (ids >= 20), which plain kNN top-4 would exclude
        assert any(v >= 20 for v in got)

    def test_rank1_is_nearest_and_deterministic(self):
        from xema_ray.stages.similarity import mmr_topk

        rng = np.random.default_rng(32)
        base = rng.standard_normal((60, 8)).astype(np.float32)
        ds1 = _emb_ds(base, blocks=2)
        ds2 = _emb_ds(base, blocks=9)
        q = ([7], base[7:8])
        a = mmr_topk(ds1, q, k=3, pool=10)
        b = mmr_topk(ds2, q, k=3, pool=10)
        assert a.equals(b)
        assert a["vec_id"].to_pylist()[0] == 7  # rank 1 = plain argmax


@pytest.mark.usefixtures("ray_session")
class TestPersistedIvfPq:
    def test_written_index_search_equals_fused(self, tmp_path):
        from xema_ray.stages.pq import (ivf_coarse_fit, ivfpq_search_index,
                                        ivfpq_write_index, knn_ivfpq,
                                        pq_fit)

        rng = np.random.default_rng(41)
        base = rng.standard_normal((300, 16)).astype(np.float32)
        ds = _emb_ds(base, blocks=5)
        coarse = ivf_coarse_fit(ds, nlist=8, iters=2, seed=1)
        cb = pq_fit(ds, m=4, k=8, iters=2, seed=2)
        idx = ivfpq_write_index(ds, coarse, cb, str(tmp_path / "idx"))
        q = ([0, 1], base[:2])
        a = ivfpq_search_index(idx, q, coarse, cb, k=7, nprobe=3)
        b = knn_ivfpq(ds, q, coarse, cb, k=7, nprobe=3)
        assert a.equals(b)

    def test_scan_prunes_to_probed_partitions(self, tmp_path):
        import glob
        import os

        from xema_ray.stages.pq import (ivf_coarse_fit, ivfpq_write_index,
                                        pq_fit)

        rng = np.random.default_rng(42)
        base = rng.standard_normal((200, 8)).astype(np.float32)
        ds = _emb_ds(base, blocks=3)
        coarse = ivf_coarse_fit(ds, nlist=8, iters=2, seed=3)
        cb = pq_fit(ds, m=2, k=8, iters=2, seed=4)
        idx = ivfpq_write_index(ds, coarse, cb, str(tmp_path / "idx"))
        parts = glob.glob(os.path.join(idx, "list_part=*"))
        assert len(parts) >= 4  # lists materialized as directories
        # every row of a partition carries the matching plain column
        import pyarrow.parquet as pq_

        for p in parts[:3]:
            lid = int(p.rsplit("=", 1)[1])
            f = glob.glob(os.path.join(p, "*.parquet"))[0]
            assert set(pq_.read_table(f)["list"].to_pylist()) == {lid}
