"""Snapshot diff + split-assign stages (stages/diff.py, sample.split_assign)."""

import numpy as np
import pyarrow as pa
import pytest

from xema_ray.stages.diff import diff_counts, snapshot_diff
from xema_ray.stages.sample import rate_threshold_hex, split_assign


def _ds(rows, **kw):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows), **kw)


def _collect(ds):
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tabs) if tabs else pa.table({})


@pytest.mark.usefixtures("ray_session")
class TestSnapshotDiff:
    def _fixture(self):
        cur = _ds({"doc_id": [1, 2, 3, 4],
                   "text": ["a", "b NEW", "c", "d"]})
        prev = _ds({"doc_id": [2, 3, 4, 5],
                    "text": ["b", "c", "d", "e"]})
        return cur, prev

    @pytest.mark.parametrize("hash_fn", ["fast", "md5"])
    def test_statuses(self, hash_fn):
        cur, prev = self._fixture()
        out = _collect(snapshot_diff(cur, prev, hash_fn=hash_fn))
        got = dict(zip(out["doc_id"].to_pylist(),
                       out["status"].to_pylist()))
        assert got == {1: "added", 2: "changed", 3: "unchanged",
                       4: "unchanged", 5: "removed"}

    def test_counts_rollup(self):
        cur, prev = self._fixture()
        d = snapshot_diff(cur, prev)
        assert diff_counts(d) == {"added": 1, "removed": 1,
                                  "changed": 1, "unchanged": 2}

    def test_partitioning_invariance(self):
        n = 200
        cur = _ds({"doc_id": list(range(n)),
                   "text": [f"doc {i}" if i % 3 else f"doc {i} edited"
                            for i in range(n)]}, override_num_blocks=7)
        prev = _ds({"doc_id": list(range(5, n + 5)),
                    "text": [f"doc {i}" for i in range(5, n + 5)]},
                   override_num_blocks=3)
        out = _collect(snapshot_diff(cur, prev, num_partitions=5))
        got = dict(zip(out["doc_id"].to_pylist(),
                       out["status"].to_pylist()))
        assert len(got) == n + 5
        for i in range(n + 5):
            if i < 5:
                want = "added"
            elif i >= n:
                want = "removed"
            else:
                want = "changed" if i % 3 == 0 else "unchanged"
            assert got[i] == want, i


@pytest.mark.usefixtures("ray_session")
class TestSplitAssign:
    def test_md5_rule_matches_reference(self):
        import hashlib

        ids = list(range(400))
        out = _collect(split_assign(_ds({"doc_id": ids}),
                                    rates={"test": 0.05, "val": 0.05},
                                    hash_fn="md5"))
        t1 = rate_threshold_hex(0.05)
        t2 = rate_threshold_hex(0.10)
        got = dict(zip(out["doc_id"].to_pylist(),
                       out["split"].to_pylist()))
        for i in ids:
            h = hashlib.md5(str(i).encode()).hexdigest()
            want = "test" if h < t1 else ("val" if h < t2 else "train")
            assert got[i] == want

    @pytest.mark.parametrize("hash_fn", ["fast", "md5"])
    def test_exhaustive_and_stable(self, hash_fn):
        ids = list(range(1000))
        a = _collect(split_assign(_ds({"doc_id": ids}), hash_fn=hash_fn))
        b = _collect(split_assign(
            _ds({"doc_id": ids}, override_num_blocks=9), hash_fn=hash_fn))
        ga = sorted(zip(a["doc_id"].to_pylist(), a["split"].to_pylist()))
        gb = sorted(zip(b["doc_id"].to_pylist(), b["split"].to_pylist()))
        assert ga == gb  # partitioning-independent
        labels = {s for _, s in ga}
        assert labels <= {"train", "val", "test"}
        frac_train = sum(s == "train" for _, s in ga) / len(ga)
        assert 0.85 <= frac_train <= 0.95

    def test_growth_stability(self):
        """A doc's split never changes when the corpus grows."""
        small = _collect(split_assign(_ds({"doc_id": list(range(100))})))
        big = _collect(split_assign(_ds({"doc_id": list(range(500))})))
        sm = dict(zip(small["doc_id"].to_pylist(),
                      small["split"].to_pylist()))
        bg = dict(zip(big["doc_id"].to_pylist(), big["split"].to_pylist()))
        assert all(bg[k] == v for k, v in sm.items())


@pytest.mark.usefixtures("ray_session")
class TestExactDedupBest:
    def test_argmax_branches(self):
        import ray.data as rd

        from xema_ray.stages.dedup import exact_dedup_best

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": ["a", "a", "b", "b", "c", "c", "solo"],
            "q": [5, 9, 7, 7, 3, 1, 8]}), override_num_blocks=3)
        out = pa.concat_tables(list(
            exact_dedup_best(ds, lambda t: t["q"].to_numpy())
            .iter_batches(batch_format="pyarrow")))
        got = {r["doc_id"]: (r["q"], r["n_copies"])
               for r in out.to_pylist()}
        # variant wins (2: q9), tie -> min id (3), original wins (5)
        assert got == {2: (9, 2), 3: (7, 2), 5: (3, 2)}

    def test_cross_batch_fold(self):
        import ray.data as rd

        from xema_ray.stages.dedup import exact_dedup_best

        n = 300
        ds = rd.from_arrow(pa.table({
            "doc_id": list(range(n)),
            "text": [f"t{i % 50}" for i in range(n)],
            "q": [(i * 7) % 13 for i in range(n)]}),
            override_num_blocks=11)
        out = pa.concat_tables(list(
            exact_dedup_best(ds, lambda t: t["q"].to_numpy())
            .iter_batches(batch_format="pyarrow")))
        assert out.num_rows == 50
        want = {}
        for i in range(n):
            k = f"t{i % 50}"
            q = (i * 7) % 13
            if k not in want or (-q, i) < want[k]:
                want[k] = (-q, i)
        got = {r["doc_id"]: r["q"] for r in out.to_pylist()}
        assert got == {i: -negq for (negq, i) in want.values()}
        assert set(out["n_copies"].to_pylist()) == {6}


@pytest.mark.usefixtures("ray_session")
class TestDiffProperties:
    def test_random_snapshots_match_dict_reference(self):
        """Differential vs a pure-python dict diff over random snapshot
        pairs (ids overlap partially, texts flip randomly)."""
        import ray.data as rd

        rng = np.random.default_rng(17)
        for trial in range(4):
            n = int(rng.integers(5, 60))
            cur_ids = sorted(rng.choice(100, size=n, replace=False)
                             .tolist())
            m = int(rng.integers(5, 60))
            prev_ids = sorted(rng.choice(100, size=m, replace=False)
                              .tolist())
            cur = {i: f"t{i}" if rng.random() < 0.7 else f"t{i} v2"
                   for i in cur_ids}
            prev = {i: f"t{i}" for i in prev_ids}
            want = {}
            for i in set(cur) | set(prev):
                if i not in prev:
                    want[i] = "added"
                elif i not in cur:
                    want[i] = "removed"
                else:
                    want[i] = "unchanged" if cur[i] == prev[i] \
                        else "changed"
            out = _collect(snapshot_diff(
                _ds({"doc_id": list(cur), "text": list(cur.values())},
                    override_num_blocks=3),
                _ds({"doc_id": list(prev), "text": list(prev.values())},
                    override_num_blocks=2), num_partitions=4))
            got = dict(zip(out["doc_id"].to_pylist(),
                           out["status"].to_pylist()))
            assert got == want, trial

    def test_null_text_both_sides_is_unchanged(self):
        cur = _ds({"doc_id": [1, 2], "text": [None, "a"]})
        prev = _ds({"doc_id": [1, 2], "text": [None, None]})
        out = _collect(snapshot_diff(cur, prev))
        got = dict(zip(out["doc_id"].to_pylist(),
                       out["status"].to_pylist()))
        assert got == {1: "unchanged", 2: "changed"}


@pytest.mark.usefixtures("ray_session")
class TestDedupBestDifferential:
    def test_random_tables_match_pandas(self):
        import pandas as pd
        import ray.data as rd

        from xema_ray.stages.dedup import exact_dedup_best

        rng = np.random.default_rng(23)
        for trial in range(3):
            n = int(rng.integers(20, 200))
            df = pd.DataFrame({
                "doc_id": np.arange(n),
                "text": [f"c{v}" for v in rng.integers(0, n // 3, n)],
                "q": rng.integers(0, 10, n).astype(np.int64)})
            out = pa.concat_tables(list(exact_dedup_best(
                rd.from_pandas(df).repartition(5),
                lambda t: t["q"].to_numpy())
                .iter_batches(batch_format="pyarrow")))
            got = {r["doc_id"]: (r["q"], r["n_copies"])
                   for r in out.to_pylist()}
            grp = df.sort_values(["q", "doc_id"],
                                 ascending=[False, True]) \
                .groupby("text")
            want = {}
            for _, g in grp:
                if len(g) >= 2:
                    r0 = g.iloc[0]
                    want[int(r0["doc_id"])] = (int(r0["q"]), len(g))
            assert got == want, trial
