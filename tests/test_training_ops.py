"""Round-3 training-data export operators: distributed prefix-scan /
sequence packing, train-eval decontamination, deterministic sampling —
each checked against an in-process numpy/set oracle on randomized data
(the SQL oracles in pipelines/queries.py check them end-to-end)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _gather(out):
    df = pd.concat([b.to_pandas() for b in
                    out.iter_batches(batch_format="pyarrow")],
                   ignore_index=True)
    return df


def test_global_offsets_matches_numpy_scan(ray_session):
    import ray.data as rd

    from xema_ray.stages.pack import global_offsets

    rng = np.random.default_rng(21)
    n = 5000
    ids = [f"doc-{i:06d}" for i in rng.permutation(n)]
    vals = rng.integers(1, 500, size=n)
    tbl = pa.table({"doc_id": pa.array(ids), "n_tok": pa.array(vals)})
    out = _gather(global_offsets(rd.from_arrow(tbl), n_buckets=7))
    out = out.sort_values("doc_id").reset_index(drop=True)
    ref = pd.DataFrame({"doc_id": ids, "n_tok": vals}).sort_values("doc_id")
    expect = np.concatenate([[0], np.cumsum(ref["n_tok"].to_numpy())[:-1]])
    assert (out["offset"].to_numpy() == expect).all()


def test_global_offsets_duplicate_keys_stable(ray_session):
    # duplicate order keys with distinct values order by (key, value);
    # exact-duplicate rows are interchangeable -> row SET is stable
    import ray.data as rd

    from xema_ray.stages.pack import global_offsets

    tbl = pa.table({
        "doc_id": pa.array(["a", "a", "a", "b"]),
        "n_tok": pa.array([5, 3, 3, 7]),
    })
    rows = set()
    for _ in range(2):
        df = _gather(global_offsets(rd.from_arrow(tbl), n_buckets=3))
        rows_now = set(map(tuple, df[["doc_id", "n_tok", "offset"]]
                           .itertuples(index=False)))
        rows = rows or rows_now
        assert rows_now == rows
    assert rows == {("a", 3, 0), ("a", 3, 3), ("a", 5, 6), ("b", 7, 11)}


def test_pack_assignments_bins(ray_session):
    import ray.data as rd

    from xema_ray.stages.pack import pack_assignments

    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "n_tok": pa.array([100, 100, 100, 50]),
    })
    df = _gather(pack_assignments(rd.from_arrow(tbl), capacity=128)) \
        .sort_values("doc_id").reset_index(drop=True)
    # stream: a[0,100) b[100,200) c[200,300) d[300,350); bins of 128
    assert df["bin_first"].tolist() == [0, 0, 1, 2]
    assert df["bin_last"].tolist() == [0, 1, 2, 2]
    assert df["n_bins"].tolist() == [1, 2, 2, 1]


def test_contaminated_docs_fixture(ray_session):
    import ray.data as rd

    from xema_ray.stages.decontam import contaminated_docs

    evl = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog",
                          "pack my box with five dozen liquor jugs"]),
    }))
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], type=pa.int64()),
        "text": pa.array([
            "totally unrelated content about ray data pipelines",
            # contains the 5-gram "quick brown fox jumps over"
            "he saw the quick brown fox jumps over it all",
            "pack my box with five dozen liquor jugs",  # full overlap
        ]),
    }))
    df = _gather(contaminated_docs(train, evl, n=5)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == [11, 12]
    assert df.loc[1, "n_hits"] == 4  # 8 words -> 4 distinct 5-grams
    assert df.loc[0, "n_hits"] >= 1


def test_stratified_sample_deterministic_and_rate(ray_session):
    import ray.data as rd

    from xema_ray.stages.sample import stratified_sample

    n = 20000
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "source": pa.array(["web" if i % 2 else "books" for i in range(n)]),
    })
    rates = {"web": 0.1, "books": 0.4}
    for hash_fn in ("fast", "md5"):
        a = _gather(stratified_sample(rd.from_arrow(tbl), rates,
                                      hash_fn=hash_fn))
        b = _gather(stratified_sample(rd.from_arrow(tbl), rates,
                                      hash_fn=hash_fn))
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # reproducible
        got = a.groupby("source").size()
        assert abs(got.get("web", 0) / (n / 2) - 0.1) < 0.03
        assert abs(got.get("books", 0) / (n / 2) - 0.4) < 0.03


def test_train_val_split_disjoint_and_complete(ray_session):
    import ray.data as rd

    from xema_ray.stages.sample import train_val_split

    n = 5000
    tbl = pa.table({"doc_id": pa.array([f"d{i}" for i in range(n)]),
                    "x": pa.array(list(range(n)))})
    train, val = train_val_split(rd.from_arrow(tbl), val_rate=0.1)
    t = set(_gather(train)["doc_id"])
    v = set(_gather(val)["doc_id"])
    assert t.isdisjoint(v) and len(t) + len(v) == n
    assert abs(len(v) / n - 0.1) < 0.02


def test_rate_threshold_one_keeps_everything(ray_session):
    """code-review r3: rate 1.0 must keep 100% in BOTH hash modes (the
    hex-truncation bug silently kept ~6%)."""
    import ray.data as rd

    from xema_ray.stages.sample import rate_threshold_hex, stratified_sample

    assert rate_threshold_hex(1.0) > "f" * 32
    tbl = pa.table({"doc_id": pa.array([f"d{i}" for i in range(500)]),
                    "source": pa.array(["s"] * 500)})
    for mode in ("md5", "fast"):
        out = _gather(stratified_sample(rd.from_arrow(tbl), {"s": 1.0},
                                        hash_fn=mode))
        assert len(out) == 500, mode


def test_dedup_resume_invalidates_on_config_change(ray_session, tmp_path):
    """code-review r3: rerunning run_exact_dedup with a different hash_fn
    must NOT reuse the stale digests."""
    import glob

    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import run_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a", "a", "b"]),
    }), str(src / "s0.parquet"))
    paths = sorted(glob.glob(str(src / "*.parquet")))
    out = str(tmp_path / "out")
    s1 = run_exact_dedup(paths, out, hash_fn="fast")
    assert s1.survivors == 2
    s2 = run_exact_dedup(paths, out, hash_fn="md5")
    assert s2.partitions_skipped == 0  # config change invalidated both phases
    assert s2.survivors == 2


def test_fuzzy_contaminated_docs_planted(ray_session):
    """Planted near-dup: a train doc sharing most 3-grams with an eval
    item is flagged with the exact gram-set Jaccard; an unrelated doc is
    not; an exact duplicate scores 1.0."""
    import ray.data as rd

    from xema_ray.stages.decontam import fuzzy_contaminated_docs

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # edit last word
    train = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [near, "totally different words entirely here now",
                 eval_text],
    }))
    evl = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [eval_text]}))
    out = pd.DataFrame(fuzzy_contaminated_docs(
        train, evl, n=3, threshold_ppm=300_000).take_all()) \
        .sort_values("doc_id").reset_index(drop=True)
    # eval: 6 distinct 3-grams; near: 6, sharing 5 -> j = 5/7
    assert list(out["doc_id"]) == [10, 12]
    assert list(out["eval_id"]) == [1, 1]
    assert list(out["n_shared"]) == [5, 6]
    assert list(out["jaccard_ppm"]) == [5 * 1_000_000 // 7, 1_000_000]


def test_fuzzy_contaminated_docs_empty_and_nulls(ray_session):
    import ray.data as rd

    from xema_ray.stages.decontam import fuzzy_contaminated_docs

    train = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["some words here", None]}))
    # empty eval set -> no pairs, and the eval_id column keeps the id
    # column's REAL type (an empty python list would infer Arrow null)
    evl = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype=np.int64),
        "text": pd.Series([], dtype=object)}))
    out_ds = fuzzy_contaminated_docs(train, evl)
    assert out_ds.take_all() == []
    sch = out_ds.schema()
    assert dict(zip(sch.names, sch.types))["eval_id"] == pa.int64()
    # null train text -> no crash, no pair
    evl2 = rd.from_pandas(pd.DataFrame({"doc_id": [9],
                                        "text": ["some words here"]}))
    out2 = pd.DataFrame(fuzzy_contaminated_docs(
        train, evl2, n=3).take_all())
    assert list(out2["doc_id"]) == [1]


def test_importance_weights_matches_reference(ray_session):
    """DSIR weights == a pure-pandas recompute of the same add-one
    smoothed bucket-ratio estimator, and docs drawn from the target
    slice outscore (per gram) docs with disjoint vocabulary."""
    import hashlib

    import ray.data as rd

    from xema_ray.stages.text import importance_weights

    rng = np.random.default_rng(5)
    tgt_vocab = [f"tw{i}" for i in range(30)]
    oth_vocab = [f"ow{i}" for i in range(30)]
    rows = []
    for i in range(40):
        is_t = i % 2 == 0
        words = rng.choice(tgt_vocab if is_t else oth_vocab, 12)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "source": "tgt" if is_t else "oth"})
    df = pd.DataFrame(rows)
    out = pd.DataFrame(importance_weights(
        rd.from_pandas(df), target_sources=("tgt",)).take_all()) \
        .sort_values("doc_id").reset_index(drop=True)

    # reference recompute
    B = 4096
    prof_cr = np.zeros(B, np.int64)
    prof_ct = np.zeros(B, np.int64)
    doc_buckets = []
    for _, r in df.iterrows():
        ws = r["text"].split()
        bks = [int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:3], 16) % B
               for a, b in zip(ws, ws[1:])]
        doc_buckets.append(bks)
        for b in bks:
            prof_cr[b] += 1
            if r["source"] == "tgt":
                prof_ct[b] += 1
    w = (prof_ct + 1) * 1_000_000 // (prof_cr + 1)
    want_sc = [int(sum(w[b] for b in bks)) for bks in doc_buckets]
    want_ng = [len(bks) for bks in doc_buckets]
    assert list(out["score"]) == want_sc
    assert list(out["n_grams"]) == want_ng
    tgt_avg = out[df.source == "tgt"]["score"].sum() / sum(
        want_ng[i] for i in range(0, 40, 2))
    oth_avg = out[df.source == "oth"]["score"].sum() / sum(
        want_ng[i] for i in range(1, 40, 2))
    assert tgt_avg > 2 * oth_avg
