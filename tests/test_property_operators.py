"""Property tests for the round-2 operators: the distributed range join
and hopping windows must agree with brute-force single-process oracles on
randomized inputs (hypothesis drives shapes; one shared Ray session)."""

import numpy as np
import pandas as pd
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
