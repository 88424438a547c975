"""Round-3 additions: tf-idf top terms, token-bigram heavy hitters,
schema inference, exact-k stratified sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


# ----------------------------------------------------------------------
# tf-idf
# ----------------------------------------------------------------------


def test_tfidf_ranks_rare_terms_first(ray_session):
    from xema_ray.stages.text import tfidf_top_terms

    ds = _ds({"doc_id": [1, 2, 3],
              "text": ["shared shared zebra", "shared common yak",
                       "shared common fill"]})
    out = pd.concat([b.to_pandas() for b in tfidf_top_terms(ds, k=1)
                     .iter_batches(batch_format="pyarrow")])
    top = out.set_index("doc_id")["term"]
    # doc 1: zebra df=1 tf=1 -> 1e12; shared df=3 tf=2 -> 666e9
    assert top.loc[1] == "zebra"
    # doc 2: 'yak' (df=1) outranks 'common' (df=2) and 'shared' (df=3)
    assert top.loc[2] == "yak"
    assert set(out.columns) == {"doc_id", "term", "tf", "df", "score"}


def test_tfidf_score_is_exact_integer(ray_session):
    from xema_ray.stages.text import tfidf_top_terms

    ds = _ds({"doc_id": [1, 2], "text": ["a a b", "a c"]})
    out = pd.concat([b.to_pandas() for b in tfidf_top_terms(ds, k=3)
                     .iter_batches(batch_format="pyarrow")])
    r = out[(out.doc_id == 1) & (out.term == "a")].iloc[0]
    assert r["score"] == 2 * 1_000_000_000_000 // 2
    r = out[(out.doc_id == 1) & (out.term == "b")].iloc[0]
    assert r["score"] == 1_000_000_000_000


# ----------------------------------------------------------------------
# bigram heavy hitters
# ----------------------------------------------------------------------


def _bigrams_brute(lists, k=20, vocab=100):
    from collections import Counter

    c = Counter()
    for row in lists:
        if row is None:
            continue
        for a, b in zip(row, row[1:]):
            c[(a, b)] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_top_token_bigrams_matches_brute(ray_session):
    from xema_ray.stages.stats import top_token_bigrams

    rng = np.random.default_rng(5)
    lists = [rng.integers(0, 9, size=rng.integers(0, 12)).tolist()
             for _ in range(300)]
    lists[10] = None
    lists[11] = []          # empty rows exercise the boundary mask
    lists[299] = []         # trailing empty row (reduceat-style edge)
    tbl = pa.table({"tokens": pa.array(lists, type=pa.list_(pa.int32()))})
    import ray.data as rd

    got = top_token_bigrams(rd.from_arrow(tbl), k=15, vocab=100)
    want = _bigrams_brute(lists, k=15)
    got_rows = list(zip(got["t1"].to_pylist(), got["t2"].to_pylist(),
                        got["n"].to_pylist()))
    assert got_rows == [(a, b, n) for (a, b), n in want]


def test_top_token_bigrams_trailing_pair_not_dropped(ray_session):
    """Regression: a trailing EMPTY list used to clip its offset onto
    the last element and erase the final genuine pair."""
    import ray.data as rd

    from xema_ray.stages.stats import top_token_bigrams

    tbl = pa.table({"tokens": pa.array([[1, 2, 3], []],
                                       type=pa.list_(pa.int32()))})
    got = top_token_bigrams(rd.from_arrow(tbl), k=10, vocab=10)
    rows = set(zip(got["t1"].to_pylist(), got["t2"].to_pylist()))
    assert rows == {(1, 2), (2, 3)}


# ----------------------------------------------------------------------
# schema inference
# ----------------------------------------------------------------------


def test_profile_and_schema_self_consistency(ray_session):
    import ray.data as rd

    from xema_ray.schema.builder import compile_schema
    from xema_ray.schema.infer import (infer_schema, profile_dataset,
                                       profile_rows)
    from xema_ray.stages.validate import validate_dataset

    tbl = pa.table({
        "doc_id": pa.array(["a-1", "b-22", None], type=pa.string()),
        "n_tok": pa.array([3, 7, 5], type=pa.int32()),
        "tokens": pa.array([[1, 2, 9], [4] * 7, [0, 5, 6, 7, 8]],
                           type=pa.list_(pa.int32())),
        "source": pa.array(["web", "web", "books"], type=pa.string()),
    })
    ds = rd.from_arrow(tbl)
    prof = profile_dataset(ds)
    assert prof["n_tok"]["minimum"] == 3 and prof["n_tok"]["maximum"] == 7
    assert prof["doc_id"]["nulls"] == 1
    assert prof["doc_id"]["min_length"] == 3
    assert prof["tokens"]["elem_maximum"] == 9
    assert prof["source"]["enum"] == ["books", "web"]
    rows = profile_rows(prof)
    assert "enum" in rows["prop"].to_pylist()

    # the inferred schema accepts every row it was inferred from
    schema = compile_schema(infer_schema(ds))
    res = validate_dataset(ds, schema)
    assert res.violations().count() == 0
    # required excludes the nullable column
    assert "doc_id" not in infer_schema(ds)[1]["required"]
    assert "source" in infer_schema(ds)[1]["required"]


def test_enum_overflow_suppresses_enum(ray_session):
    import ray.data as rd

    from xema_ray.schema.infer import ENUM_LIMIT, profile_dataset

    tbl = pa.table({"s": pa.array([f"v{i}" for i in range(ENUM_LIMIT + 5)],
                                  type=pa.string())})
    prof = profile_dataset(rd.from_arrow(tbl))
    assert prof["s"]["enum"] is None


# ----------------------------------------------------------------------
# exact-k stratified sample
# ----------------------------------------------------------------------


def test_stratified_topk_exact_quota_and_determinism(ray_session):
    from xema_ray.stages.sample import stratified_topk_sample

    rows = {"doc_id": list(range(100)),
            "source": ["a"] * 60 + ["b"] * 35 + ["c"] * 5}
    a = stratified_topk_sample(_ds(rows), k=10).to_pandas()
    b = stratified_topk_sample(_ds(rows), k=10).to_pandas()
    counts = a.groupby("source").size().to_dict()
    # full quota where the stratum is big enough, whole stratum where not
    assert counts == {"a": 10, "b": 10, "c": 5}
    pd.testing.assert_frame_equal(
        a.sort_values(["source", "doc_id"]).reset_index(drop=True),
        b.sort_values(["source", "doc_id"]).reset_index(drop=True))


def test_stratified_topk_md5_matches_sql_rule(ray_session):
    import hashlib

    from xema_ray.stages.sample import stratified_topk_sample

    rows = {"doc_id": list(range(40)), "source": ["x"] * 40}
    got = stratified_topk_sample(_ds(rows), k=5, hash_fn="md5").to_pandas()
    want = sorted(range(40),
                  key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                 i))[:5]
    assert sorted(got["doc_id"].tolist()) == sorted(want)


def test_top_token_bigrams_mg_equals_groupby(ray_session):
    """The no-shuffle MG+recount scale path and the unconditional
    groupby exchange agree — on skewed (certifiable) and near-uniform
    (certificate-failing, auto falls back) inputs alike."""
    import ray.data as rd

    from xema_ray.stages.stats import top_token_bigrams

    rng = np.random.default_rng(11)
    for dist in ("zipf", "uniform"):
        if dist == "zipf":
            vals = np.minimum(rng.zipf(1.5, size=(400, 20)), 99) - 1
        else:
            vals = rng.integers(0, 99, size=(400, 20))
        tbl = pa.table({"tokens": pa.array(vals.tolist(),
                                           type=pa.list_(pa.int32()))})
        a = top_token_bigrams(rd.from_arrow(tbl), k=10, vocab=100,
                              strategy="auto", capacity=64)
        b = top_token_bigrams(rd.from_arrow(tbl), k=10, vocab=100,
                              strategy="groupby")
        c = top_token_bigrams(rd.from_arrow(tbl), k=10, vocab=100,
                              strategy="exchange")
        assert a.equals(b), dist
        assert c.equals(b), dist


# ----------------------------------------------------------------------
# shared passages + tokenize ids
# ----------------------------------------------------------------------


def test_shared_passage_pairs_detects_copied_run(ray_session):
    from xema_ray.stages.dedup import shared_passage_pairs

    passage = "alpha beta gamma delta epsilon zeta"   # 6 words = w+n-1
    ds = _ds({"doc_id": [1, 2, 3],
              "text": [f"one unique opening here {passage}",
                       f"{passage} totally different tail words",
                       "no overlap at all in this document text"]})
    out = shared_passage_pairs(ds, window=4, ngram=3).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    assert (out["n_shared"] >= 1).all()


def test_shared_passage_skew_cap_drops_boilerplate_fp(ray_session):
    from xema_ray.stages.dedup import shared_passage_pairs

    shared = "common shared boiler plate words here"
    ds = _ds({"doc_id": list(range(6)),
              "text": [f"{shared} unique tail {i} marker" for i in range(6)]})
    # cap below the bucket size -> the boilerplate fp emits no pairs
    out = shared_passage_pairs(ds, window=4, ngram=3,
                               max_bucket=3).to_pandas()
    big = shared_passage_pairs(ds, window=4, ngram=3,
                               max_bucket=256).to_pandas()
    assert len(big) >= len(out)
    assert len(big) == 15   # all C(6,2) pairs share the passage fp


def test_shared_passage_distributed_count_matches_driver(ray_session):
    """auto_driver_limit=0 forces the coarse pair-hash-bucket counting
    exchange; the (doc_a, doc_b, n_shared) table must equal the driver
    fold's, including multi-fingerprint intersection counts."""
    from xema_ray.stages.dedup import shared_passage_pairs

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = _ds({"doc_id": [f"d{i}" for i in range(8)],
              "text": [f"{passage} unique tail {i} marker text" if i < 5
                       else f"totally disjoint document {i} body words "
                            f"with nothing shared at all {i}"
                       for i in range(8)]})
    drv = shared_passage_pairs(ds, window=4, ngram=3).to_pandas()
    dist = shared_passage_pairs(ds, window=4, ngram=3,
                                auto_driver_limit=0).to_pandas()
    assert list(dist.columns) == list(drv.columns)
    pd.testing.assert_frame_equal(dist, drv)
    assert (drv["n_shared"] > 1).any()   # multi-fp counts exercised


def test_shared_passage_as_dataset_matches_table(ray_session):
    """as_dataset=True returns the same (doc_a, doc_b, n_shared) rows
    as the Table contract on BOTH lanes (driver fold and the forced
    distributed count), just unordered and driver-free."""
    from xema_ray.stages.dedup import shared_passage_pairs

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    ds = _ds({"doc_id": [f"d{i}" for i in range(6)],
              "text": [f"{passage} unique tail {i} marker" for i in range(6)]})
    want = shared_passage_pairs(ds, window=4, ngram=3).to_pandas()
    for limit in (4_000_000, 0):
        out = shared_passage_pairs(
            ds, window=4, ngram=3, auto_driver_limit=limit,
            as_dataset=True)
        if limit:   # driver lane: multi-block entry via _pairs_table_to_ds
            assert out.num_blocks() > 1, limit
        got = out.to_pandas().sort_values(["doc_a", "doc_b"],
                                          ignore_index=True)
        pd.testing.assert_frame_equal(got, want, obj=f"limit={limit}")


def test_shared_passage_pairs_honors_id_col(ray_session):
    from xema_ray.stages.dedup import shared_passage_pairs

    passage = "alpha beta gamma delta epsilon zeta"
    ds = _ds({"page_id": ["p1", "p2"],
              "text": [f"one unique opening here {passage}",
                       f"{passage} totally different tail words"]})
    out = shared_passage_pairs(ds, window=4, ngram=3,
                               id_col="page_id").to_pandas()
    assert ("p1", "p2") in set(zip(out["doc_a"], out["doc_b"]))


def test_tokenize_ids_rank_and_roundtrip(ray_session):
    from xema_ray.stages.text import build_rank_vocab, tokenize_ids

    ds = _ds({"doc_id": [1, 2], "text": ["b b b a", "a c b"]})
    words, ids = build_rank_vocab(ds)
    vocab = {w.decode(): i for w, i in zip(words, ids)}
    assert vocab == {"b": 0, "a": 1, "c": 2}   # by (-count, word)
    out = pd.concat([b.to_pandas() for b in tokenize_ids(ds)
                     .iter_batches(batch_format="pyarrow")])
    d1 = out[out.doc_id == 1].sort_values("pos")
    assert d1["id"].tolist() == [0, 0, 0, 1]
    assert d1["pos"].tolist() == [1, 2, 3, 4]


def test_tokenize_ids_unk_for_out_of_vocab(ray_session):
    import numpy as np

    from xema_ray.stages.text import tokenize_ids

    ds = _ds({"doc_id": [1], "text": ["hello world"]})
    vocab = (np.array([b"hello"], dtype="S"), np.array([0], dtype=np.int64))
    out = pd.concat([b.to_pandas() for b in tokenize_ids(ds, vocab=vocab)
                     .iter_batches(batch_format="pyarrow")])
    assert out.sort_values("pos")["id"].tolist() == [0, -1]


def test_top_token_bigrams_out_of_vocab_no_aliasing(ray_session):
    """Regression (code-review r3): t1*vocab+t2 packing aliased
    out-of-range tokens onto unrelated bigrams; the injective 64-bit
    pack must count (7,60000), (3,-1) etc. faithfully."""
    import ray.data as rd

    from xema_ray.stages.stats import top_token_bigrams

    lists = [[7, 60000]] * 5 + [[8, 9743]] * 3 + [[3, -1]] * 4
    tbl = pa.table({"tokens": pa.array(lists, type=pa.list_(pa.int32()))})
    for strat in ("mg", "groupby"):
        got = top_token_bigrams(rd.from_arrow(tbl), k=5, vocab=50257,
                                strategy=strat)
        rows = list(zip(got["t1"].to_pylist(), got["t2"].to_pylist(),
                        got["n"].to_pylist()))
        assert rows == [(7, 60000, 5), (3, -1, 4), (8, 9743, 3)], strat


def test_infer_float_column_stays_number(ray_session):
    """Regression (code-review r3): integral float bounds must not
    flip a float column to type 'integer' — 2.5 would fail the schema
    inferred from its own data."""
    import ray.data as rd

    from xema_ray.schema.builder import compile_schema
    from xema_ray.schema.infer import infer_schema
    from xema_ray.stages.validate import validate_dataset

    tbl = pa.table({"x": pa.array([1.0, 2.5, 4.0], type=pa.float64())})
    ds = rd.from_arrow(tbl)
    dsl = infer_schema(ds)
    assert dsl[1]["properties"]["x"][0] == "number"
    res = validate_dataset(ds, compile_schema(dsl))
    assert res.violations().count() == 0


def test_infer_int_bounds_exact_above_2_53(ray_session):
    import ray.data as rd

    from xema_ray.schema.infer import profile_dataset

    big = (1 << 53) + 1
    tbl = pa.table({"x": pa.array([1, big], type=pa.int64())})
    prof = profile_dataset(rd.from_arrow(tbl))
    assert prof["x"]["maximum"] == big          # float64 would round


def test_infer_nan_column_yields_no_bounds(ray_session):
    import ray.data as rd

    from xema_ray.schema.infer import profile_dataset

    tbl = pa.table({"x": pa.array([float("nan"), 2.0, float("nan")],
                                  type=pa.float64())})
    prof = profile_dataset(rd.from_arrow(tbl))
    assert prof["x"]["minimum"] == 2.0 and prof["x"]["maximum"] == 2.0


def test_stratified_topk_empty_keeps_input_types(ray_session):
    import ray.data as rd

    from xema_ray.stages.sample import stratified_topk_sample

    tbl = pa.table({"doc_id": pa.array([], type=pa.int64()),
                    "source": pa.array([], type=pa.string())})
    out = stratified_topk_sample(rd.from_arrow(tbl), k=3)
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.schema.field("source").type == pa.string()


# ----------------------------------------------------------------------
# funnel
# ----------------------------------------------------------------------


def test_funnel_depths_ordering_semantics(ray_session):
    import datetime as dt

    import ray.data as rd

    from xema_ray.stages.funnel import funnel_depths

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, typ, sec):
        return {"user_id": u, "event_type": typ,
                "ts": t0 + dt.timedelta(seconds=sec)}

    rows = [
        # u1: full ordered funnel -> depth 3
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2: purchase BEFORE click -> depth 2
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # u3: only view -> depth 1
        ev(3, "view", 0), ev(3, "error", 5),
        # u4: click without view -> depth 0
        ev(4, "click", 0),
        # u5: no funnel events at all -> depth 0
        ev(5, "error", 0),
        # u6: click at the SAME instant as view (not strictly after) -> 1
        ev(6, "view", 0), ev(6, "click", 0),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = funnel_depths(ds, ["view", "click", "purchase"]).to_pandas()
    got = dict(zip(out["depth"], out["n_users"]))
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}


def test_funnel_user_spanning_batches(ray_session):
    """Per-batch min partials must fold exactly when one user's events
    land in different blocks."""
    import datetime as dt

    import ray.data as rd

    from xema_ray.stages.funnel import funnel_depths

    t0 = dt.datetime(2026, 1, 1)
    a = pd.DataFrame([{"user_id": 1, "event_type": "view", "ts": t0}])
    b = pd.DataFrame([{"user_id": 1, "event_type": "click",
                       "ts": t0 + dt.timedelta(seconds=5)}])
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    out = funnel_depths(ds, ["view", "click", "purchase"]).to_pandas()
    got = dict(zip(out["depth"], out["n_users"]))
    assert got == {0: 0, 1: 0, 2: 1, 3: 0}


def test_retention_counts_brute_differential(ray_session):
    import datetime as dt

    import ray.data as rd

    from xema_ray.stages.funnel import retention_counts

    rng = np.random.default_rng(3)
    t0 = dt.datetime(2026, 1, 1)
    rows = [{"user_id": int(rng.integers(0, 25)),
             "ts": t0 + dt.timedelta(hours=int(rng.integers(0, 24 * 12)))}
            for _ in range(400)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = retention_counts(ds, horizon_days=7).to_pandas()

    # brute force
    df = pd.DataFrame(rows)
    df["day"] = (df["ts"].astype("int64") // 1000) // 86_400_000_000 * 0 \
        + (df["ts"] - pd.Timestamp("1970-01-01")).dt.days
    ud = df[["user_id", "day"]].drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min().rename("cohort")
    j = ud.join(cohort, on="user_id")
    j["k"] = j["day"] - j["cohort"]
    want = j[j["k"] <= 7].groupby(["cohort", "k"]).size() \
        .rename("n_users").reset_index().sort_values(["cohort", "k"]) \
        .reset_index(drop=True)
    got = got.sort_values(["cohort", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_retention_user_spanning_batches(ray_session):
    """Cross-batch distinct (user, day) pairs must dedupe in the fold
    and the cohort must be the GLOBAL min day."""
    import datetime as dt

    import ray.data as rd

    from xema_ray.stages.funnel import retention_counts

    t0 = dt.datetime(2026, 1, 5)
    a = pd.DataFrame([{"user_id": 1, "ts": t0 + dt.timedelta(days=2)},
                      {"user_id": 1, "ts": t0 + dt.timedelta(days=2,
                                                             hours=3)}])
    b = pd.DataFrame([{"user_id": 1, "ts": t0}])
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    out = retention_counts(ds, horizon_days=7).to_pandas()
    day0 = (pd.Timestamp(t0) - pd.Timestamp("1970-01-01")).days
    assert out.to_dict("records") == [
        {"cohort": day0, "k": 0, "n_users": 1},
        {"cohort": day0, "k": 2, "n_users": 1}]
