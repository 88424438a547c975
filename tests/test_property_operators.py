"""Property tests for the round-2 operators: the distributed range join
and hopping windows must agree with brute-force single-process oracles on
randomized inputs (hypothesis drives shapes; one shared Ray session)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def interval_case(draw):
    n_keys = draw(st.integers(1, 3))
    facts = []
    ivs = []
    for k in range(n_keys):
        n_iv = draw(st.integers(0, 4))
        start = 0
        for _ in range(n_iv):
            gap = draw(st.integers(0, 5))
            width = draw(st.integers(0, 8))
            lo = start + gap
            hi = lo + width
            ivs.append((k, lo, hi, f"iv{k}_{lo}"))
            start = hi + 1  # non-overlapping per key
        n_f = draw(st.integers(0, 8))
        for _ in range(n_f):
            facts.append((k, draw(st.integers(-3, start + 5))))
    return facts, ivs


@settings(max_examples=25, deadline=None)
@given(case=interval_case())
def test_range_join_matches_bruteforce(ray_session, case):
    import ray.data as rd

    from xema_ray.stages.rangejoin import range_join

    facts, ivs = case
    if not facts or not ivs:
        return
    fdf = pd.DataFrame(facts, columns=["k", "ts"])
    fdf["fid"] = np.arange(len(fdf))
    idf = pd.DataFrame(ivs, columns=["k", "lo", "hi", "name"])
    out = range_join(rd.from_pandas(fdf), rd.from_pandas(idf),
                     key="k", ts_col="ts", start_col="lo", end_col="hi",
                     interval_cols=["name"]).take_all()
    got = {(r["fid"], r["name"]) for r in out}
    want = set()
    for _, f in fdf.iterrows():
        for _, iv in idf.iterrows():
            if f["k"] == iv["k"] and iv["lo"] <= f["ts"] <= iv["hi"]:
                want.add((f["fid"], iv["name"]))
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    ts=st.lists(st.integers(-7200, 7200), min_size=1, max_size=40),
    size_s=st.sampled_from([600, 3600]),
    hop_s=st.sampled_from([300, 600]),
)
def test_hopping_windows_match_bruteforce(ray_session, ts, size_s, hop_s):
    import ray.data as rd

    from xema_ray.stages.windows import hopping_window_counts

    df = pd.DataFrame({"ts": pd.to_datetime(ts, unit="s"),
                       "value": [1.0] * len(ts)})
    out = {r["window_start"]: r["n"]
           for r in hopping_window_counts(
               rd.from_pandas(df), size_s=size_s, hop_s=hop_s).take_all()}
    want: dict = {}
    for t in ts:
        t_us = t * 1_000_000
        size_us, hop_us = size_s * 1_000_000, hop_s * 1_000_000
        k = (t_us - size_us) // hop_us + 1
        while k * hop_us <= t_us:
            want[k * hop_us] = want.get(k * hop_us, 0) + 1
            k += 1
    assert out == want


def test_hot_key_bucketed_sessions_match_plain(ray_session):
    """r3 (VERDICT item 7): a 10x-dominant key routed through the
    (key, time-bucket) sub-partitioned path yields byte-identical session
    summaries to the plain one-group-per-key path."""
    import ray.data as rd

    from xema_ray.stages.windows import sessions_per_key

    rng = np.random.default_rng(11)
    # hot user 0: 2000 events; 10 normal users: ~200 each
    ts, uid = [], []
    base = 1_700_000_000_000_000  # epoch us
    for u, n in [(0, 2000)] + [(u, 200) for u in range(1, 11)]:
        t = np.sort(rng.integers(0, 86_400_000_000, size=n)) + base
        ts.extend(t.tolist())
        uid.extend([u] * n)
    tbl = pa.table({"user_id": pa.array(uid, type=pa.int64()),
                    "ts": pa.array(ts, type=pa.int64())})
    ds = rd.from_arrow(tbl)

    def gather(out):
        df = pd.concat([b.to_pandas() for b in
                        out.iter_batches(batch_format="pyarrow")],
                       ignore_index=True)
        return df.sort_values("user_id").reset_index(drop=True)

    plain = gather(sessions_per_key(rd.from_arrow(tbl), gap_seconds=900))
    for bucket_s in (3600, 907, 10):   # incl. width smaller than the gap
        bucketed = gather(sessions_per_key(ds, gap_seconds=900,
                                           time_bucket_seconds=bucket_s))
        pd.testing.assert_frame_equal(plain, bucketed), bucket_s


def test_hot_key_bucketed_range_join_matches_plain(ray_session):
    """r3 (VERDICT item 7): boundary-replicated (key, time-bucket) range
    join equals the one-group-per-key range join on a 10x-dominant key."""
    import ray.data as rd

    from xema_ray.stages.rangejoin import range_join

    rng = np.random.default_rng(12)
    facts, ivs = [], []
    for u, n_f, n_iv in [(0, 1500, 40)] + [(u, 150, 5) for u in range(1, 8)]:
        t = np.sort(rng.integers(0, 10_000_000, size=n_f))
        facts.append(pa.table({
            "user_id": pa.array([u] * n_f, type=pa.int64()),
            "ts": pa.array(t, type=pa.int64()),
            "fid": pa.array(rng.integers(0, 10**9, size=n_f), type=pa.int64()),
        }))
        starts = np.sort(rng.choice(10_000_000, size=n_iv, replace=False))
        ends = np.minimum(starts + rng.integers(1, 400_000, size=n_iv),
                          np.r_[starts[1:] - 1, 10_000_001])
        ivs.append(pa.table({
            "user_id": pa.array([u] * n_iv, type=pa.int64()),
            "s": pa.array(starts, type=pa.int64()),
            "e": pa.array(ends, type=pa.int64()),
            "iv_id": pa.array(np.arange(n_iv) + u * 1000, type=pa.int64()),
        }))
    fact_tbl = pa.concat_tables(facts)
    iv_tbl = pa.concat_tables(ivs)

    def gather(out):
        df = pd.concat([b.to_pandas() for b in
                        out.iter_batches(batch_format="pyarrow")],
                       ignore_index=True)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    plain = gather(range_join(rd.from_arrow(fact_tbl), rd.from_arrow(iv_tbl),
                              key="user_id", ts_col="ts",
                              start_col="s", end_col="e"))
    assert len(plain) > 100  # the fixture actually joins
    for w in (1_000_000, 123_457):
        bucketed = gather(range_join(
            rd.from_arrow(fact_tbl), rd.from_arrow(iv_tbl),
            key="user_id", ts_col="ts", start_col="s", end_col="e",
            time_bucket_us=w))
        pd.testing.assert_frame_equal(plain, bucketed), w


def test_hot_key_bucketed_asof_matches_plain(ray_session):
    """r3 (VERDICT item 7): carry-in sub-bucketed as-of join equals the
    one-group-per-key as-of join on a 10x-dominant key."""
    import ray.data as rd

    from xema_ray.stages.asof import asof_join_events

    rng = np.random.default_rng(13)
    rows = []
    base = 1_700_000_000_000_000
    for u, n in [(0, 3000)] + [(u, 300) for u in range(1, 6)]:
        t = np.sort(rng.integers(0, 86_400_000_000, size=n)) + base
        kinds = rng.choice(["click", "view", "other"], size=n,
                           p=[0.4, 0.4, 0.2])
        for ts, k in zip(t, kinds):
            rows.append((u, int(ts), k))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
    })

    def gather(out):
        df = pd.concat([b.to_pandas() for b in
                        out.iter_batches(batch_format="pyarrow")],
                       ignore_index=True)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    plain = gather(asof_join_events(rd.from_arrow(tbl)))
    assert (plain["matched_us"] == -1).any()  # carry-less lefts exist
    for bucket_s in (3600, 911):
        bucketed = gather(asof_join_events(
            rd.from_arrow(tbl), time_bucket_seconds=bucket_s))
        pd.testing.assert_frame_equal(plain, bucketed), bucket_s


# ---------------------------------------------------------------------------
# AllPairs/PPJoin exact set-similarity join: randomized corpora vs brute force
# ---------------------------------------------------------------------------


@st.composite
def _corpus_case(draw):
    n_docs = draw(st.integers(min_value=2, max_value=18))
    vocab = [f"v{i}" for i in range(draw(st.integers(4, 12)))]
    docs = []
    for _ in range(n_docs):
        ln = draw(st.integers(0, 14))
        docs.append(" ".join(draw(st.sampled_from(vocab))
                             for _ in range(ln)))
    # bias toward actual near-dups: sometimes clone an earlier doc
    for i in range(1, n_docs):
        if draw(st.booleans()):
            docs[i] = docs[draw(st.integers(0, i - 1))]
    thr = draw(st.sampled_from([0.3, 0.5, 0.7, 0.9]))
    return docs, thr


@settings(max_examples=20, deadline=None)
@given(case=_corpus_case())
def test_allpairs_property_matches_bruteforce(ray_session, case):
    """Prefix-filter candidates verified == brute-force all-pairs Jaccard
    on arbitrary corpora (dups, empty docs, short docs, any threshold)."""
    import pandas as pd
    import ray.data as rd

    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       ngram_jaccard,
                                       verify_pairs_jaccard)

    docs, thr = case
    ids = [f"d{i:02d}" for i in range(len(docs))]
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ngram_jaccard(docs[i], docs[j]) >= thr:
                want.add((ids[i], ids[j]))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": docs}))
    cands = allpairs_jaccard_pairs(ds, threshold=thr)
    got = {tuple(sorted((r["doc_a"], r["doc_b"])))
           for r in verify_pairs_jaccard(
               cands, ds, threshold=thr, method="hash").take_all()}
    assert got == want
