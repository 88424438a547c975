"""Tests for the rolling window, daily-active, broadcast semi-join and
filtered-kNN operators (late round 3)."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(n=300, users=7, seed=11):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2026, 1, 1)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": [t0 + dt.timedelta(seconds=int(s))
               for s in rng.integers(0, 30 * 86400, n)],
        "value": rng.normal(10, 5, n),
    })


def test_rolling_per_key_brute_differential(ray_session):
    import ray.data as rd

    from xema_ray.stages.windows import rolling_per_key

    df = _events()
    got = rolling_per_key(rd.from_pandas(df), window_rows=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    d = df.sort_values(["user_id", "ts", "event_id"]).copy()
    d["fp"] = np.floor(d["value"].to_numpy() * 1_000_000).astype(np.int64)
    d["roll"] = d.groupby("user_id")["fp"] \
        .transform(lambda s: s.rolling(4, min_periods=1).sum()).astype(np.int64)
    us = d["ts"].astype("datetime64[us]").astype("int64")
    d["delta"] = us.groupby(d["user_id"]).diff().fillna(-1).astype(np.int64)
    want = d.sort_values("event_id").reset_index(drop=True)

    assert (got["roll_sum_fp"].to_numpy() == want["roll"].to_numpy()).all()
    assert (got["delta_us"].to_numpy() == want["delta"].to_numpy()).all()


def test_rolling_user_spanning_batches(ray_session):
    """One user's events split across input blocks must still see a
    single ts-ordered stream after the groupby."""
    import ray.data as rd

    from xema_ray.stages.windows import rolling_per_key

    t0 = dt.datetime(2026, 1, 1)
    a = pd.DataFrame({"event_id": [2], "user_id": [1],
                      "ts": [t0 + dt.timedelta(seconds=20)], "value": [3.0]})
    b = pd.DataFrame({"event_id": [1], "user_id": [1],
                      "ts": [t0], "value": [2.0]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    out = rolling_per_key(ds, window_rows=4).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["delta_us"].tolist() == [-1, 20_000_000]
    assert out["roll_sum_fp"].tolist() == [2_000_000, 5_000_000]


def test_daily_active_brute_differential(ray_session):
    import ray.data as rd

    from xema_ray.stages.funnel import daily_active

    df = _events(n=500, users=12, seed=5)
    got = daily_active(rd.from_pandas(df)).to_pandas() \
        .sort_values("day").reset_index(drop=True)

    d = df.copy()
    d["day"] = (d["ts"] - pd.Timestamp("1970-01-01")).dt.days
    want = d.groupby("day").agg(
        n_events=("user_id", "size"),
        n_users=("user_id", "nunique")).reset_index()
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_daily_active_cross_batch_distinct(ray_session):
    """The same (day, user) pair arriving in two blocks must count one
    user but both events."""
    import ray.data as rd

    from xema_ray.stages.funnel import daily_active

    t0 = dt.datetime(2026, 1, 1)
    a = pd.DataFrame({"user_id": [1], "ts": [t0]})
    b = pd.DataFrame({"user_id": [1],
                      "ts": [t0 + dt.timedelta(hours=5)]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    out = daily_active(ds).to_pandas()
    assert len(out) == 1
    assert int(out["n_events"].iloc[0]) == 2
    assert int(out["n_users"].iloc[0]) == 1


def test_broadcast_semi_join(ray_session):
    import ray.data as rd

    from xema_ray.stages.shuffle import broadcast_semi_join

    fact = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": list("abcd")}))
    dim = pa.table({"kk": [2, 4, 9]})
    out = broadcast_semi_join(fact, dim, on="k", right_on="kk") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [2, 4]
    assert out["v"].tolist() == ["b", "d"]


def test_broadcast_semi_join_dataset_dim_and_empty(ray_session):
    import ray.data as rd

    from xema_ray.stages.shuffle import broadcast_semi_join

    fact = rd.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
    dim = rd.from_arrow(pa.table({"k": [2]}))
    out = broadcast_semi_join(fact, dim, on="k").to_pandas()
    assert out["k"].tolist() == [2]

    none = broadcast_semi_join(
        fact, pa.table({"k": pa.array([], type=pa.int64())}), on="k")
    assert none.count() == 0


def test_knn_filtered_matches_prefiltered_brute(ray_session):
    import ray.data as rd

    from xema_ray.stages.similarity import knn_brute_force, knn_filtered

    rng = np.random.default_rng(7)
    n, d = 120, 16
    vecs = rng.normal(size=(n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs]),
    })
    keep = np.arange(0, n, 3, dtype=np.int64)  # every 3rd id passes
    queries = ([0, 1], vecs[:2])

    ds = rd.from_arrow(tbl)
    got = knn_filtered(ds, keep, queries, k=5).to_pandas()

    mask = np.isin(np.arange(n), keep)
    pre = rd.from_arrow(tbl.filter(pa.array(mask)))
    want = knn_brute_force(pre, queries, k=5).to_pandas()
    pd.testing.assert_frame_equal(got, want)
    assert set(got["vec_id"]).issubset(set(keep.tolist()))


def test_zscore_outliers_brute_differential(ray_session):
    import math

    import ray.data as rd

    from xema_ray.stages.stats import grouped_zscore_outliers

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(400)],
        "source": rng.choice(["a", "b", "c"], 400),
        "n_tok": rng.integers(1, 2000, 400).astype(np.int64),
    })
    # plant extreme rows so outliers exist
    df.loc[0, "n_tok"] = 100_000
    df.loc[1, "n_tok"] = 90_000
    got = grouped_zscore_outliers(rd.from_pandas(df), key="source",
                                  col="n_tok", z=3).to_pandas()

    want = set()
    for s, g in df.groupby("source"):
        x = [int(v) for v in g["n_tok"]]
        n, sm, ssq = len(x), sum(x), sum(v * v for v in x)
        var_num = n * ssq - sm * sm
        for i, v in zip(g.index, x):
            if (v * n - sm) ** 2 > 9 * var_num:
                want.add(df.loc[i, "doc_id"])
    assert set(got["doc_id"]) == want
    assert len(want) >= 2


def test_zscore_exact_boundary_is_not_outlier(ray_session):
    """d^2 == z^2 * var_num exactly (values [0, 2], z=1): the strict >
    must exclude the row; a float-sqrt threshold could wrongly flag it."""
    import ray.data as rd

    from xema_ray.stages.stats import grouped_zscore_outliers

    df = pd.DataFrame({"doc_id": ["a", "b"], "source": ["s", "s"],
                       "n_tok": np.array([0, 2], dtype=np.int64)})
    out = grouped_zscore_outliers(rd.from_pandas(df), z=1).to_pandas()
    assert len(out) == 0


def test_grouped_rank_counts_matches_window_rank(ray_session):
    import ray.data as rd

    from xema_ray.stages.quantiles import grouped_rank_counts

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(500)],
        "source": rng.choice(["x", "y"], 500),
        "n_tok": rng.integers(1, 40, 500).astype(np.int64),  # heavy ties
    })
    got = grouped_rank_counts(rd.from_pandas(df), key="source",
                              col="n_tok").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    d = df.copy()
    d["r_lt"] = d.groupby("source")["n_tok"].rank(method="min") \
        .astype(np.int64) - 1
    d["n_grp"] = d.groupby("source")["n_tok"].transform("size") \
        .astype(np.int64)
    want = d.sort_values("doc_id").reset_index(drop=True)
    assert (got["r_lt"].to_numpy() == want["r_lt"].to_numpy()).all()
    assert (got["n_grp"].to_numpy() == want["n_grp"].to_numpy()).all()


@pytest.mark.parametrize("bucket_s", [3600, 86400, 7 * 86400])
def test_rolling_bucketed_matches_plain(ray_session, bucket_s):
    """Hot-key time-bucket sub-partitioning must be output-identical to
    the plain per-key path for any bucket width."""
    import ray.data as rd

    from xema_ray.stages.windows import rolling_per_key

    df = _events(n=400, users=3, seed=23)  # few keys -> heavy per-key load
    plain = rolling_per_key(rd.from_pandas(df), window_rows=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    bucketed = rolling_per_key(rd.from_pandas(df), window_rows=4,
                               time_bucket_seconds=bucket_s) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, bucketed)


def test_rolling_bucketed_window_one(ray_session):
    import ray.data as rd

    from xema_ray.stages.windows import rolling_per_key

    df = _events(n=60, users=2, seed=3)
    plain = rolling_per_key(rd.from_pandas(df), window_rows=1) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    bucketed = rolling_per_key(rd.from_pandas(df), window_rows=1,
                               time_bucket_seconds=43200) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, bucketed)


def test_weekly_active_brute_differential(ray_session):
    import ray.data as rd

    from xema_ray.stages.funnel import weekly_active

    df = _events(n=600, users=15, seed=31)
    got = weekly_active(rd.from_pandas(df), window_days=7).to_pandas()

    d = df.copy()
    d["day"] = (d["ts"] - pd.Timestamp("1970-01-01")).dt.days
    lo, hi = d["day"].min(), d["day"].max()
    want = []
    for w in range(lo, hi + 1):
        n = d.loc[d["day"].between(w - 6, w), "user_id"].nunique()
        if n:
            want.append((w, n))
    assert list(zip(got["day"], got["wau"])) == want


def test_weekly_active_gap_and_window_one(ray_session):
    """A >7-day activity gap yields missing (zero) windows; window=1
    degenerates to daily distinct users."""
    import ray.data as rd

    from xema_ray.stages.funnel import daily_active, weekly_active

    t0 = dt.datetime(2026, 1, 1)
    df = pd.DataFrame({
        "user_id": np.array([1, 2, 1], dtype=np.int64),
        "ts": [t0, t0, t0 + dt.timedelta(days=20)],
    })
    out = weekly_active(rd.from_pandas(df), window_days=7).to_pandas()
    day0 = (pd.Timestamp(t0) - pd.Timestamp("1970-01-01")).days
    got = dict(zip(out["day"], out["wau"]))
    assert got[day0] == 2 and got[day0 + 6] == 2
    assert day0 + 7 not in got and got[day0 + 20] == 1

    w1 = weekly_active(rd.from_pandas(df), window_days=1).to_pandas()
    da = daily_active(rd.from_pandas(df)).to_pandas().sort_values("day")
    assert w1["day"].tolist() == da["day"].tolist()
    assert w1["wau"].tolist() == da["n_users"].tolist()


def test_knn_per_label_matches_per_partition_brute(ray_session):
    import ray.data as rd

    from xema_ray.stages.similarity import knn_brute_force, knn_per_label

    rng = np.random.default_rng(17)
    n, d = 150, 12
    vecs = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n).astype(np.int64)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs]),
        "label": pa.array(labels),
    })
    q = ([0, 1, 2], vecs[:3], labels[:3])
    got = knn_per_label(rd.from_arrow(tbl), q, k=5).to_pandas()

    frames = []
    for qi in range(3):
        mask = labels == labels[qi]
        sub = rd.from_arrow(tbl.filter(pa.array(mask)))
        w = knn_brute_force(sub, ([qi], vecs[qi:qi + 1]), k=5).to_pandas()
        frames.append(w)
    want = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    lbl = dict(zip(range(n), labels))
    assert all(lbl[v] == lbl[qid]
               for qid, v in zip(got["query_id"], got["vec_id"]))
