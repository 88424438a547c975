"""Attribution matrix + decayed scores (stages/funnel.py additions)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(ts_us, users, types, ids=None, blocks=4):
    import ray.data as rd

    ids = list(range(len(users))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(np.asarray(ts_us, np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string())}),
        override_num_blocks=blocks)


def _collect(ds):
    if isinstance(ds, pa.Table):       # driver-folded results
        return ds
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tabs) if tabs else pa.table({})


@pytest.mark.usefixtures("ray_session")
class TestAttribution:
    def test_matches_pandas(self):
        from xema_ray.stages.funnel import attribution_matrix

        rng = np.random.default_rng(6)
        n = 500
        users = rng.integers(0, 40, n).tolist()
        ts = rng.integers(0, 10**9, n).tolist()
        types = rng.choice(["view", "click", "purchase"], n).tolist()
        out = attribution_matrix(_events(ts, users, types, blocks=7))
        got = {(r["first_type"], r["last_type"]): r["n_users"]
               for r in out.to_pylist()}
        df = pd.DataFrame({"u": users, "ts": ts,
                           "id": range(n), "ty": types})
        df = df.sort_values(["u", "ts", "id"])
        f = df.groupby("u").first()["ty"]
        l = df.groupby("u").last()["ty"]
        want = pd.DataFrame({"f": f, "l": l}).value_counts().to_dict()
        assert got == {k: v for k, v in want.items()}

    def test_timestamp_tie_resolved_by_event_id(self):
        from xema_ray.stages.funnel import attribution_matrix

        out = attribution_matrix(_events(
            [100, 100, 100], [7, 7, 7], ["b", "a", "c"],
            ids=[2, 1, 3], blocks=3))
        rows = out.to_pylist()
        assert rows == [{"first_type": "a", "last_type": "c",
                         "n_users": 1}]


@pytest.mark.usefixtures("ray_session")
class TestDecayedScores:
    def test_exact_weights(self):
        from xema_ray.stages.funnel import decayed_user_scores

        day = 86_400_000_000
        # user 1: events today and 2 days ago; user 2: one 50 days ago
        # (beyond the cap)
        ds = _events([100 * day, 98 * day, 50 * day],
                     [1, 1, 2], ["x", "x", "x"], blocks=2)
        out = _collect(decayed_user_scores(ds)).sort_by("user_id")
        scores = dict(zip(out["user_id"].to_pylist(),
                          out["score"].to_pylist()))
        assert scores == {1: (1 << 40) + (1 << 38), 2: 1 << 0}

    def test_partitioning_invariance_and_halflife(self):
        from xema_ray.stages.funnel import decayed_user_scores

        day = 86_400_000_000
        ts = [(100 - k) * day for k in range(12)]
        ds1 = _events(ts, [3] * 12, ["x"] * 12, blocks=2)
        ds2 = _events(ts, [3] * 12, ["x"] * 12, blocks=11)
        a = _collect(decayed_user_scores(ds1, halflife_days=3))
        b = _collect(decayed_user_scores(ds2, halflife_days=3))
        assert a.equals(b)
        # ages 0..11 days -> age//3 in {0,0,0,1,1,1,2,2,2,3,3,3}
        want = 3 * ((1 << 40) + (1 << 39) + (1 << 38) + (1 << 37))
        assert a["score"].to_pylist() == [want]

    def test_empty_input(self):
        from xema_ray.stages.funnel import decayed_user_scores

        ds = _events([], [], [], blocks=1)
        assert _collect(decayed_user_scores(ds)).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestAttributionEdges:
    def test_empty_blocks_dont_break_schema(self):
        from xema_ray.stages.funnel import attribution_matrix

        # 8 blocks over 3 rows -> most blocks are empty; the empty
        # partial must emit the SAME schema as non-empty ones
        out = attribution_matrix(_events(
            [10, 20, 30], [1, 1, 2], ["a", "b", "c"], blocks=8))
        got = {(r["first_type"], r["last_type"]): r["n_users"]
               for r in out.to_pylist()}
        assert got == {("a", "b"): 1, ("c", "c"): 1}


@pytest.mark.usefixtures("ray_session")
class TestHardNegatives:
    def test_nearest_other_label(self):
        import ray.data as rd

        from xema_ray.stages.similarity import hard_negatives

        rng = np.random.default_rng(13)
        mat = rng.standard_normal((100, 8))
        labels = (np.arange(100) % 2).astype(np.int64)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(100), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat]),
            "label": pa.array(labels, pa.int64())}),
            override_num_blocks=4)
        out = hard_negatives(ds, ([0], mat[:1], [0]), k=5)
        got = out.to_pandas()
        assert len(got) == 5
        # every returned id has the OPPOSITE label
        assert all(labels[v] == 1 for v in got["vec_id"])
        # top-1 matches the numpy cross-label argmax
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mn @ mn[0]
        sims[labels == 0] = -np.inf
        assert got.sort_values("rank")["vec_id"].iloc[0] == \
            int(np.argmax(sims))


@pytest.mark.usefixtures("ray_session")
class TestMergeTopkTies:
    def test_identical_vectors_keep_smallest_ids(self):
        """The driver heap must evict the LARGEST id within a boundary
        tie class (reproduced in code-review r3s5 with identical
        vectors split across blocks)."""
        import ray.data as rd

        from xema_ray.stages.similarity import knn_brute_force

        vec = [1.0, 0.0, 0.0, 0.0]
        n = 12
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(list(range(10, 10 + n)), pa.int64()),
            "embedding": pa.array([vec] * n)}),
            override_num_blocks=4)
        out = knn_brute_force(ds, ([0], np.array([vec])), k=3)
        assert out["vec_id"].to_pylist() == [10, 11, 12]
        assert out["rank"].to_pylist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestTransitions:
    def test_matches_pandas_lag(self):
        from xema_ray.stages.funnel import transition_counts

        rng = np.random.default_rng(44)
        n = 400
        users = rng.integers(0, 30, n).tolist()
        ts = rng.integers(0, 10**9, n).tolist()
        types = rng.choice(["a", "b", "c"], n).tolist()
        out = transition_counts(_events(ts, users, types, blocks=6))
        got = {(r["prev_type"], r["next_type"]): r["n"]
               for r in out.to_pylist()}
        df = pd.DataFrame({"u": users, "ts": ts, "id": range(n),
                           "ty": types}).sort_values(["u", "ts", "id"])
        prev = df.groupby("u")["ty"].shift()
        want = pd.DataFrame({"p": prev, "t": df["ty"]}).dropna() \
            .value_counts().to_dict()
        assert got == want

    def test_no_cross_user_transitions(self):
        from xema_ray.stages.funnel import transition_counts

        # users interleave in time: u1 a->b, u2 c->a; no (b,c) pair
        out = transition_counts(_events(
            [1, 2, 3, 4], [1, 2, 1, 2], ["a", "c", "b", "a"], blocks=2))
        got = {(r["prev_type"], r["next_type"]): r["n"]
               for r in out.to_pylist()}
        assert got == {("a", "b"): 1, ("c", "a"): 1}
