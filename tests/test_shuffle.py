"""Skew-aware salted aggregation equals the unsalted result."""

import numpy as np
import pandas as pd
import pytest


def test_salted_aggregate_matches_pandas(ray_session):
    import ray.data as rd

    from xema_ray.stages.shuffle import salted_aggregate

    rng = np.random.default_rng(9)
    n = 50_000
    # 90% hot key — the skew shape of the `source` column
    keys = np.where(rng.random(n) < 0.9, "web",
                    rng.choice(["books", "code", "wiki"], size=n))
    vals = rng.integers(0, 1000, size=n)
    pdf = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(pdf)

    out = salted_aggregate(ds, "k", [("v", "sum"), ("v", "count"),
                                     ("v", "min"), ("v", "max")], salt=16)
    got = {r["k"]: r for r in out.take_all()}
    want = pdf.groupby("k")["v"].agg(["sum", "count", "min", "max"])
    for k, row in want.iterrows():
        assert got[k]["v_sum"] == row["sum"]
        assert got[k]["v_count"] == row["count"]
        assert got[k]["v_min"] == row["min"]
        assert got[k]["v_max"] == row["max"]


def test_add_hash_bucket_stable(ray_session):
    import ray.data as rd

    from xema_ray.stages.shuffle import add_hash_bucket

    pdf = pd.DataFrame({"id": [f"d{i}" for i in range(1000)]})
    a = add_hash_bucket(rd.from_pandas(pdf), "id", 32).take_all()
    b = add_hash_bucket(rd.from_pandas(pdf), "id", 32).take_all()
    am = {r["id"]: r["bucket"] for r in a}
    bm = {r["id"]: r["bucket"] for r in b}
    assert am == bm
    assert set(am.values()) <= set(range(32))
    counts = pd.Series(list(am.values())).value_counts()
    assert counts.max() < 1000 / 32 * 3  # roughly balanced


def test_broadcast_join_vectorized_left(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.shuffle import broadcast_join

    fact = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2, 9], "v": list("abcde")}))
    dim = pa.table({"ck": [1, 2, 3], "seg": ["x", "y", "z"]})
    out = broadcast_join(fact, dim, on="k", right_on="ck").take_all()
    segs = [r["seg"] for r in out]
    assert segs == ["x", "y", "z", "y", None]  # unmatched key -> null


def test_range_join_matches_and_drops(ray_session):
    """Range join: events land in their containing interval per key;
    facts outside every interval drop (inner semantics)."""
    import pandas as pd
    import ray.data as rd

    from xema_ray.stages.rangejoin import range_join

    facts = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": [5, 15, 99, 7, 3],
        "tag": list("abcde"),
    }))
    ivs = rd.from_pandas(pd.DataFrame({
        "k": [1, 1, 2],
        "lo": [0, 10, 5],
        "hi": [9, 20, 10],
        "name": ["i1", "i2", "i3"],
    }))
    out = range_join(facts, ivs, key="k", ts_col="ts",
                     start_col="lo", end_col="hi").take_all()
    got = {(r["k"], r["ts"]): r["name"] for r in out}
    assert got == {(1, 5): "i1", (1, 15): "i2", (2, 7): "i3"}
    # ts=99 (no interval) and ts=3 (before k=2's interval) dropped
    assert len(out) == 3
    # fact columns ride along with original dtypes
    assert all(isinstance(r["ts"], int) for r in out)


def test_range_join_preserves_large_ints_and_drops_null_keys(ray_session):
    """code-review r2: (1) int64 values >= 2^53 must survive exactly (the
    pandas group path floatified them); (2) null join keys drop instead of
    crashing the sort partitioner."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.rangejoin import range_join

    big = 9_007_199_254_740_993  # 2^53 + 1
    ns = 1_700_000_000_123_456_789
    facts = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", None], type=pa.string()),
        "ts": pa.array([ns, ns + 5, ns], type=pa.int64()),
        "fid": pa.array([big, big + 1, big + 2], type=pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "k": pa.array(["a", None], type=pa.string()),
        "lo": pa.array([ns - 10, 0], type=pa.int64()),
        "hi": pa.array([ns, 100], type=pa.int64()),  # ns+5 is OUTSIDE
        "name": ["iv1", "ivnull"],
    }))
    out = range_join(facts, ivs, key="k", ts_col="ts",
                     start_col="lo", end_col="hi").take_all()
    assert len(out) == 1  # ns+5 outside (no float rounding), null keys dropped
    assert out[0]["fid"] == big  # exact 2^53+1, not 2^53
    assert out[0]["ts"] == ns


def test_cluster_aware_bucket_defaults():
    """r3 (VERDICT item 10): coarse-bucket counts derive from advertised
    CPUs — more cluster CPUs -> more reduce partitions."""
    from xema_ray.stages.shuffle import default_bucket_bits, default_shuffle_buckets

    small = default_shuffle_buckets(cpus=8)
    big = default_shuffle_buckets(cpus=512)
    assert small < big
    assert default_shuffle_buckets(cpus=1) >= 16      # floor
    assert default_shuffle_buckets(cpus=10**6) <= 4096  # ceiling
    assert default_bucket_bits(cpus=8) < default_bucket_bits(cpus=2048)
    # discovery path works under the live test cluster
    assert default_shuffle_buckets() >= 16


def test_hash_strings_pandas_fallback_lane():
    """The pandas fallback lane works when polars is unavailable; both
    lanes are internally consistent (equal strings -> equal hashes,
    regardless of call batch size — the per-batch-partials invariant)."""
    import numpy as np

    import xema_ray.functions.sketches as sk

    vals = ["alpha", "beta", "alpha", "gamma"]
    for lane_pl in (sk._pl, None):
        saved = sk._pl
        sk._pl = lane_pl
        try:
            h_all = sk.hash_strings(vals)
            h_one = np.concatenate([sk.hash_strings([v]) for v in vals])
            assert (h_all == h_one).all()
            assert h_all[0] == h_all[2] and h_all[0] != h_all[1]
            assert (sk.hash_strings(vals, seed=7) != h_all).any()
        finally:
            sk._pl = saved


def test_deterministic_shuffle_fast_lane(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.shuffle import deterministic_shuffle

    tbl = pa.table({"doc_id": [f"d{i}" for i in range(400)],
                    "payload": list(range(400))})
    out = deterministic_shuffle(rd.from_arrow(tbl), shards=8,
                                hash_fn="fast").take_all()
    assert len(out) == 400
    # positions are 0..n_s-1 within each shard; payload rides along
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(8)) and len(by_shard) > 1
    for rows in by_shard.values():
        assert sorted(r["pos"] for r in rows) == list(range(len(rows)))
    # reproducible: identical assignment on rerun
    out2 = deterministic_shuffle(rd.from_arrow(tbl), shards=8,
                                 hash_fn="fast").take_all()
    k1 = sorted((r["doc_id"], r["shard"], r["pos"]) for r in out)
    k2 = sorted((r["doc_id"], r["shard"], r["pos"]) for r in out2)
    assert k1 == k2
    # order within a shard is decorrelated from input order
    big = max(by_shard.values(), key=len)
    ordered = [r["payload"] for r in sorted(big, key=lambda r: r["pos"])]
    assert ordered != sorted(ordered)


def test_deterministic_shuffle_md5_requires_16_shards(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.shuffle import deterministic_shuffle

    with pytest.raises(ValueError):
        deterministic_shuffle(rd.from_arrow(pa.table({"doc_id": [1]})),
                              shards=8, hash_fn="md5")
