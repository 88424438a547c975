"""Dedup + similarity stages on constructed fixtures with known ground
truth (near-dup recall, kNN vs exact oracle)."""

import numpy as np
import pandas as pd
import pytest


def _doc_table(rng):
    """60 docs: 20 unique, 20 exact dups of the first 10, 10 near-dups
    (small edits), 10 unrelated."""
    vocab = [f"w{i}" for i in range(500)]
    base = [" ".join(rng.choice(vocab, size=80)) for _ in range(20)]
    docs = []
    for i, t in enumerate(base):
        docs.append((f"d{i:03d}", t))
    for i in range(10):  # exact dups
        docs.append((f"x{i:03d}", base[i]))
    for i in range(10):  # near dups: change 4 of 80 words
        words = base[i].split()
        for j in rng.choice(len(words), size=4, replace=False):
            words[j] = "zz" + words[j]
        docs.append((f"n{i:03d}", " ".join(words)))
    for i in range(10):  # unrelated
        docs.append((f"u{i:03d}", " ".join(rng.choice(vocab, size=80))))
    return pd.DataFrame({"doc_id": [d[0] for d in docs],
                         "text": [d[1] for d in docs]})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    return rd.from_pandas(_doc_table(rng)), _doc_table(np.random.default_rng(5))


def test_exact_dedup_groups(docs_ds):
    ds, pdf = docs_ds
    from xema_ray.stages.dedup import exact_dedup_groups

    got = {r["doc_id"]: r["n_copies"] for r in exact_dedup_groups(ds).take_all()}
    want = pdf.groupby("text")["doc_id"].agg(["min", "count"])
    want = dict(zip(want["min"], want["count"]))
    assert got == want
    assert sum(v for v in got.values() if v > 1) == 20  # 10 pairs


def test_exact_dedup_survivor_rows(docs_ds):
    ds, pdf = docs_ds
    from xema_ray.stages.dedup import exact_dedup

    rows = exact_dedup(ds).take_all()
    assert len(rows) == pdf["text"].nunique()
    want_ids = set(pdf.groupby("text")["doc_id"].min())
    assert {r["doc_id"] for r in rows} == want_ids


def test_minhash_finds_exact_and_near_dups(docs_ds):
    ds, pdf = docs_ds
    from xema_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(ds, threshold=0.5).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    # all 10 exact-dup pairs must be found (jaccard 1.0)
    for i in range(10):
        assert (f"d{i:03d}", f"x{i:03d}") in found, f"missing exact pair {i}"
    # most near-dup pairs should be found (4/80 word edits → high jaccard)
    near = sum(1 for i in range(10) if (f"d{i:03d}", f"n{i:03d}") in found)
    assert near >= 7, f"only {near}/10 near pairs found"


def test_simhash_finds_exact_dups(docs_ds):
    """Both hash lanes (splitmix engine default, md5 oracle lane) must
    surface every exact-duplicate pair at Hamming 0 — identical gram
    sets give identical signatures in ANY hash space."""
    ds, _ = docs_ds
    from xema_ray.stages.dedup import simhash_pairs

    for hash_fn in ("fast", "md5"):
        pairs = simhash_pairs(ds, max_hamming=3, hash_fn=hash_fn).take_all()
        found = {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs}
        for i in range(10):
            assert found.get((f"d{i:03d}", f"x{i:03d}")) == 0, \
                (hash_fn, i, found.get((f"d{i:03d}", f"x{i:03d}")))


def test_verify_pairs_jaccard(docs_ds):
    ds, _ = docs_ds
    from xema_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard, verify_pairs_jaccard

    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    verified = verify_pairs_jaccard(pairs, ds, threshold=0.9).take_all()
    ids = {(p["doc_a"], p["doc_b"]) for p in verified}
    # exact dups survive 0.9; 4/80-edit near-dups (jaccard ~0.85) mostly don't
    for i in range(10):
        assert (f"d{i:03d}", f"x{i:03d}") in ids
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


def test_knn_brute_force_matches_numpy_oracle(ray_session):
    import ray.data as rd

    from xema_ray.stages.similarity import knn_brute_force

    rng = np.random.default_rng(3)
    n, d = 400, 32
    mat = rng.standard_normal((n, d))
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    ds = rd.from_arrow(__import__("pyarrow").table({
        "vec_id": np.arange(n),
        "embedding": [row.tolist() for row in mat],
    }))
    qids = [0, 1]
    out = knn_brute_force(ds, (qids, mat[qids]), k=5)
    got = out.to_pandas()
    # numpy oracle
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in qids:
        sims = mn @ mn[q]
        want = np.argsort(-sims, kind="stable")[:5]
        g = got[got["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        assert set(g) == set(want.tolist())
        assert g[0] == q  # self-match first


def test_knn_lsh_recall(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.similarity import knn_brute_force, knn_lsh

    rng = np.random.default_rng(4)
    n, d = 500, 64
    mat = rng.standard_normal((n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(n),
        "embedding": [row.tolist() for row in mat],
    }))
    q = (list(range(3)), mat[:3])
    exact = knn_brute_force(ds, q, k=5).to_pandas()
    approx = knn_lsh(ds, q, k=5, n_bits=6, dim=d, multiprobe=1).to_pandas()
    # recall@5 of the approximate index ≥ 0.5 with 1-bit multiprobe
    hits = 0
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
    assert hits / 15 >= 0.5


def test_cosine_near_dup_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(6)
    n, d = 300, 64
    mat = rng.standard_normal((n, d))
    # plant 10 near-duplicate pairs: vec n+i ≈ vec i + small noise
    dups = mat[:10] + 0.02 * rng.standard_normal((10, d))
    all_mat = np.vstack([mat, dups])
    ids = np.arange(len(all_mat))
    ds = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [r.tolist() for r in all_mat],
    }))
    pairs = cosine_near_dup_pairs(ds, threshold=0.95, n_bits=6, dim=d).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    planted = {(i, n + i) for i in range(10)}
    # LSH recall: most planted pairs co-bucket (cos ≈ 0.999)
    assert len(planted & found) >= 8, found
    # no false positives among random gaussian vectors (cos ≥ .95 is ~impossible)
    assert found <= planted | set(), found - planted


def test_media_feature_plumbing(ray_session):
    import ray.data as rd

    from xema_ray.stages.multimodal import MediaFeatureExtractor, extract_features, synthetic_media_table

    tbl = synthetic_media_table(64, seed=1)
    out = extract_features(rd.from_arrow(tbl), batch_size=16).take_all()
    assert len(out) == 64
    assert all(len(r["features"]) == 64 for r in out)
    # deterministic features (every synthetic mime has a REAL codec now)
    a = MediaFeatureExtractor()( tbl.slice(0, 4))
    b = MediaFeatureExtractor()( tbl.slice(0, 4))
    assert a.equals(b)
    # rows 0-2 are REAL ppm/wav/jpeg — non-stub mode decodes them all
    real = MediaFeatureExtractor(decode_stub=False)(tbl.slice(0, 3))
    assert real.num_rows == 3
    # ...but a genuinely codec-less mime (mp4: libraries absent) raises
    import pyarrow as pa

    mp4 = pa.table({
        "media_id": ["x"], "payload": [b"\x00\x00\x00\x18ftypmp42"],
        "mime": ["video/mp4"], "width": [0], "height": [0],
        "duration_ms": [0]})
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode_stub=False)(mp4)


def test_exact_dedup_broadcast_is_duplicate_bounded(ray_session):
    """r2 scale fix: the driver/broadcast set is O(duplicate groups) —
    a fully-unique corpus broadcasts an EMPTY set and keeps every row."""
    import ray.data as rd

    from xema_ray.stages import dedup

    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(50)],
                        "text": [f"unique text {i}" for i in range(50)]})
    ds = rd.from_pandas(pdf)
    out = dedup.exact_dedup(ds, "text", "doc_id")
    rows = out.take_all()
    assert len(rows) == 50  # all survive

    # with dups: only losers vanish; null text/id rows never survive
    pdf2 = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d", None],
        "text": ["same", "same", "other", None, "x"],
    })
    out2 = dedup.exact_dedup(rd.from_pandas(pdf2), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out2.take_all())
    assert ids == ["a", "c"]


def test_verify_pairs_distributed_no_full_scan(docs_ds):
    """verify_pairs_jaccard gathers ONLY candidate texts via a filtered
    map stage and returns identical results to a local recompute."""
    import ray.data as rd

    from xema_ray.stages.dedup import ngram_jaccard, verify_pairs_jaccard

    ds, pdf = docs_ds
    pairs = rd.from_pandas(pd.DataFrame({
        "doc_a": ["d000", "d001", "d002"],
        "doc_b": ["x000", "x001", "u000"],
    }))
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in verify_pairs_jaccard(pairs, ds, threshold=0.5).take_all()}
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    for (a, b), j in got.items():
        assert abs(j - ngram_jaccard(texts[a], texts[b])) < 1e-6
    assert ("d000", "x000") in got and ("d002", "u000") not in got


def test_minhash_sig_sample_keeps_recall(docs_ds):
    """r2 scale knob: shipping a 32-slot signature sample (4x smaller
    shuffle rider) still finds every exact and near duplicate."""
    from xema_ray.stages.dedup import minhash_lsh_pairs

    ds, pdf = docs_ds
    pairs = minhash_lsh_pairs(ds, threshold=0.6, sig_sample=32).take_all()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for i in range(10):  # exact dups planted as d### vs x###
        assert (f"d{i:03d}", f"x{i:03d}") in found, f"missed exact dup {i}"


def test_knn_ivf_recall(ray_session):
    """IVF (k-means quantizer + nprobe probing) recall vs exact top-k on a
    CLUSTERED corpus (IVF's natural regime)."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.similarity import ivf_index, kmeans_fit, knn_brute_force, knn_ivf

    rng = np.random.default_rng(8)
    n_clusters, per, d = 8, 80, 32
    centers = rng.standard_normal((n_clusters, d)) * 3
    mat = np.vstack([c + rng.standard_normal((per, d)) for c in centers])
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(len(mat)),
        "embedding": [r.tolist() for r in mat],
    }))
    cent = kmeans_fit(ds, k=n_clusters, iters=4, seed=1)
    assert cent.shape == (n_clusters, d)
    indexed = ivf_index(ds, cent).materialize()
    # every vector got a list assignment and lists are populated
    lids = {r["list_id"] for r in indexed.select_columns(["list_id"]).take_all()}
    assert len(lids) >= n_clusters // 2
    q = (list(range(4)), mat[:4])
    exact = knn_brute_force(ds, q, k=5).to_pandas()
    approx = knn_ivf(indexed, q, cent, k=5, nprobe=3).to_pandas()
    hits = 0
    for qid in range(4):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
    assert hits / 20 >= 0.8, f"IVF recall {hits}/20"


def test_knn_lsh_multiprobe_widens_candidates(ray_session):
    """code-review r2: multiprobe > 1 must actually probe multi-bit
    flips (it was a no-op beyond distance 1)."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.similarity import knn_brute_force, knn_lsh

    rng = np.random.default_rng(12)
    n, d = 400, 32
    mat = rng.standard_normal((n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(n), "embedding": [r.tolist() for r in mat]}))
    q = ([0, 1], mat[:2])
    exact = knn_brute_force(ds, q, k=5).to_pandas()

    def recall(mp):
        approx = knn_lsh(ds, q, k=5, n_bits=8, dim=d, multiprobe=mp).to_pandas()
        hits = 0
        for qid in (0, 1):
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
        return hits / 10

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1  # wider probe can only help
    assert r3 >= 0.7, f"multiprobe=3 recall {r3}"


def test_minhash_pair_ordering_natural(ray_session):
    """code-review r2: doc_a < doc_b must hold under NATURAL ordering for
    integer ids (was string comparison: '10' < '2')."""
    import ray.data as rd

    from xema_ray.stages.dedup import minhash_lsh_pairs

    pdf = pd.DataFrame({"doc_id": [2, 10], "text": ["same words here now"] * 2})
    pairs = minhash_lsh_pairs(rd.from_pandas(pdf), threshold=0.5).take_all()
    assert pairs and pairs[0]["doc_a"] == 2 and pairs[0]["doc_b"] == 10


def test_signature_matrix_trailing_empty_doc_regression():
    """code-review r3: a trailing zero-word document must not truncate
    the preceding document's MinHash/SimHash signature (the reduceat
    clamp bug)."""
    import numpy as np

    from xema_ray.stages.dedup import MinHashStage, SimHashStage
    import pandas as pd
    import pyarrow as pa

    text = "the quick brown fox jumps over the lazy dog"
    m = MinHashStage(col="text", id_col="doc_id")
    alone = m.signature_matrix([text])
    with_empty = m.signature_matrix([text, "", "   !!"])
    assert np.array_equal(alone[0], with_empty[0])
    assert (with_empty[1] == np.iinfo(np.uint64).max).all()

    s = SimHashStage(col="text", id_col="doc_id")
    t1 = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                   "text": pa.array([text])})
    t2 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "text": pa.array([text, ""])})
    sig1 = s(t1)["simhash"].to_pylist()[0]
    sig2 = s(t2)["simhash"].to_pylist()[0]
    assert sig1 == sig2


def test_exact_dedup_project_strategies_agree(ray_session):
    """driver and coarse-bucket-groupby merge strategies must select the
    identical survivor set (and match a naive dedup), including the
    numpy bytes-sort min-id path and non-ASCII / numeric id fallbacks."""
    import ray.data as rd

    from xema_ray.stages.dedup import exact_dedup_project

    pdf = pd.DataFrame({
        "doc_id": [f"id-{i:03d}" for i in range(40)],
        "text": [f"body {i % 12}" for i in range(40)],  # 12 groups, dups
        "extra": np.arange(40),
    })
    expect = set(pdf.groupby("text")["doc_id"].min())
    for strategy in ("driver", "groupby"):
        out = exact_dedup_project(
            rd.from_pandas(pdf), col="text", id_col="doc_id",
            keep_cols=("extra",), strategy=strategy).take_all()
        assert {r["doc_id"] for r in out} == expect, strategy
        assert all(set(r) == {"doc_id", "extra"} for r in out)

    # numeric ids: keeper is the numeric (not lexicographic) min
    pdf2 = pd.DataFrame({"doc_id": [9, 10, 100, 2],
                         "text": ["x", "x", "x", "y"]})
    out = exact_dedup_project(rd.from_pandas(pdf2), col="text",
                              id_col="doc_id", strategy="driver").take_all()
    assert {r["doc_id"] for r in out} == {9, 2}

    # non-ASCII ids exercise the object-compare fallback
    pdf3 = pd.DataFrame({"doc_id": ["zz", "é-1", "aa"],
                         "text": ["s", "s", "s"]})
    out = exact_dedup_project(rd.from_pandas(pdf3), col="text",
                              id_col="doc_id", strategy="driver").take_all()
    assert {r["doc_id"] for r in out} == {"aa"}


def test_minhash_driver_path_matches_groupby(docs_ds):
    """The measured-auto driver scan must yield the same PAIR SET as the
    coarse-bucket groupby exchange (the bucket is a pure function of the
    band key, so both walk identical fine groups)."""
    from xema_ray.stages.dedup import minhash_lsh_pairs

    ds, _pdf = docs_ds
    a = {(r["doc_a"], r["doc_b"])
         for r in minhash_lsh_pairs(ds, threshold=0.5,
                                    strategy="driver").take_all()}
    b = {(r["doc_a"], r["doc_b"])
         for r in minhash_lsh_pairs(ds, threshold=0.5,
                                    strategy="groupby").take_all()}
    assert a == b and len(a) > 0


def test_minhash_driver_empty_pairs_keeps_id_types(ray_session):
    """No qualifying pairs: the driver path must still return the
    id column types, not pandas' float64 inference."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": ["a1", "b2", "c3"],
        "text": ["alpha beta gamma", "delta epsilon zeta",
                 "eta theta iota"]}))
    out = minhash_lsh_pairs(ds, threshold=0.9, strategy="driver")
    sch = out.schema().base_schema
    assert sch.field("doc_a").type == pa.string()
    assert sch.field("doc_b").type == pa.string()
    assert out.count() == 0


def test_minhash_max_bucket_retention_is_order_independent(ray_session):
    """A degenerate bucket larger than max_bucket keeps the doc_id-
    sorted prefix on both strategies, whatever the row order."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.dedup import minhash_lsh_pairs

    text = "same boilerplate text repeated in every document here"
    n = 12
    ids = [f"d{i:02d}" for i in range(n)]
    rev = pa.table({"doc_id": ids[::-1], "text": [text] * n})
    fwd = pa.table({"doc_id": ids, "text": [text] * n})
    kw = dict(threshold=0.5, max_bucket=5)
    outs = []
    for tbl in (fwd, rev):
        for strat in ("driver", "groupby"):
            ds = rd.from_arrow(tbl, override_num_blocks=3)
            outs.append({(r["doc_a"], r["doc_b"]) for r in
                         minhash_lsh_pairs(ds, strategy=strat,
                                           **kw).take_all()})
    assert outs[0] == outs[1] == outs[2] == outs[3]
    # the retained subset is the doc_id-sorted prefix
    assert outs[0] == {(f"d{i:02d}", f"d{j:02d}")
                      for i in range(5) for j in range(i + 1, 5)}


def test_semantic_dedup_vs_bruteforce(ray_session):
    """Kmeans-blocked dominance == per-cluster brute force, and the
    result is partition-invariant (order-free rule)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.similarity import (_normalize, kmeans_fit,
                                            semantic_dedup)

    rng = np.random.default_rng(11)
    # 3 tight clusters of near-dups + uniform noise
    centers = _normalize(rng.normal(size=(3, 16)))
    rows, ids = [], []
    for i in range(120):
        c = centers[i % 3]
        rows.append(c + 0.05 * rng.normal(size=16))
        ids.append(i)
    for i in range(120, 200):
        rows.append(rng.normal(size=16))
        ids.append(i)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in rows],
                                        pa.list_(pa.float32()))})

    def brute(k, tau, nblocks):
        ds = rd.from_arrow(t).repartition(nblocks)
        cent = kmeans_fit(ds, k=k, iters=3, seed=17)
        m = _normalize(np.asarray(
            [np.asarray(r, np.float64) for r in
             t["embedding"].to_pylist()]))
        lab = np.argmax(m @ cent.T, axis=1)
        sim = m @ m.T
        want = []
        for i in range(len(ids)):
            dom = [j for j in range(i) if lab[j] == lab[i]
                   and sim[i, j] >= tau]
            if dom:
                want.append((ids[i], int(lab[i]), ids[min(dom)]))
        out = semantic_dedup(rd.from_arrow(t).repartition(nblocks),
                             k=k, iters=3, seed=17, tau=tau)
        got = sorted(
            (r["vec_id"], r["cluster"], r["dup_of"])
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())
        return sorted(want), got

    want2, got2 = brute(4, 0.9, 2)
    assert got2 == want2 and len(want2) > 50
    want7, got7 = brute(4, 0.9, 7)
    assert got7 == want7 == want2


def test_dup_spans_known_passages(ray_session):
    """A shared verbatim passage is recovered as one maximal span in
    every doc containing it; unique text yields no spans; the fast and
    md5 lanes agree; within-doc repetition counts toward min_count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.dedup import dup_spans

    passage = " ".join(f"shared{i}" for i in range(12))  # 12 words
    rng = np.random.default_rng(3)

    def noise(k, tag):
        return " ".join(f"{tag}{rng.integers(1_000_000)}" for _ in range(k))

    docs = {
        "a": noise(5, "ua") + " " + passage + " " + noise(4, "ua"),
        "b": noise(9, "ub") + " " + passage,
        "c": noise(30, "uc"),                      # no dups
        "d": "tiny doc",                           # < n words
        # within-doc repeat: the same 10 words twice, no other copy
        "e": " ".join(f"rep{i}" for i in range(10)) + " " + noise(3, "ue")
             + " " + " ".join(f"rep{i}" for i in range(10)),
    }
    t = pa.table({"doc_id": pa.array(list(docs)),
                  "text": pa.array(list(docs.values()))})
    results = {}
    for lane in ("fast", "md5", "verified"):
        out = dup_spans(rd.from_arrow(t).repartition(3), n=8,
                        min_count=2, hash_fn=lane)
        rows = sorted(
            (r["doc_id"], r["start_pos"], r["end_pos"], r["n_words"])
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())
        results[lane] = rows
    assert results["fast"] == results["md5"] == results["verified"]
    rows = results["fast"]
    by_doc = {}
    for d, s, e, w in rows:
        by_doc.setdefault(d, []).append((s, e, w))
    # doc a: passage words at positions 6..17 (1-based)
    assert by_doc["a"] == [(6, 17, 12)]
    # doc b: passage at 10..21
    assert by_doc["b"] == [(10, 21, 12)]
    assert "c" not in by_doc and "d" not in by_doc
    # doc e: both copies of the 10-word run are flagged
    assert by_doc["e"] == [(1, 10, 10), (14, 23, 10)]


def test_remove_spans_applies_manifest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.dedup import dup_spans, remove_spans

    passage = " ".join(f"shared{i}" for i in range(12))
    docs = {
        "a": "u1 u2 u3 " + passage + " tail1 tail2",
        "b": passage,
        "c": "plain unique words only here nothing repeats at all",
        "d": None,  # null text -> 0 words, empty clean_text
    }
    t = pa.table({"doc_id": pa.array(list(docs)),
                  "text": pa.array(list(docs.values()), pa.string())})
    ds = rd.from_arrow(t)
    manifest = dup_spans(ds, n=8, min_count=2, hash_fn="fast")
    out = {r["doc_id"]: r for b in remove_spans(ds, manifest)
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    assert out["a"]["clean_text"] == "u1 u2 u3 tail1 tail2"
    assert out["a"]["n_words"] == 17 and out["a"]["n_removed"] == 12
    assert out["b"]["clean_text"] == "" and out["b"]["n_removed"] == 12
    assert out["c"]["n_removed"] == 0 and \
        out["c"]["clean_text"].startswith("plain unique")
    assert out["d"]["n_words"] == 0 and out["d"]["clean_text"] == ""


def test_run_span_dedup_resume_and_invalidation(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.stages.dedup import run_span_dedup

    d = tmp_path / "in"; d.mkdir()
    passage = " ".join(f"shared{i}" for i in range(10))
    for i in range(2):
        pq.write_table(pa.table({
            "doc_id": [i * 10, i * 10 + 1],
            "text": [f"unique{i} one two three four {passage}",
                     f"other{i} five six seven eight {passage} tail{i}"],
        }), str(d / f"s{i}.parquet"))
    paths = sorted(str(p) for p in d.glob("*.parquet"))
    out = str(tmp_path / "out")
    s1 = run_span_dedup(paths, out, n=8, min_count=2)
    assert s1.partitions_done == 2 and s1.rows_out == 4
    shards1 = {p.name: p.stat().st_mtime_ns
               for p in (tmp_path / "out" / "shards").glob("*.parquet")}
    # resume: everything skipped, dup-gram set loaded from disk
    s2 = run_span_dedup(paths, out, n=8, min_count=2)
    assert s2.partitions_skipped == 2 and s2.partitions_done == 0
    shards2 = {p.name: p.stat().st_mtime_ns
               for p in (tmp_path / "out" / "shards").glob("*.parquet")}
    assert shards1 == shards2
    # config change invalidates the scrub shards
    s3 = run_span_dedup(paths, out, n=9, min_count=2)
    assert s3.partitions_done == 2
    got = pq.read_table(out + "/shards/s0.parquet").to_pandas()
    # the shared 10-word passage is gone from every doc (n=8 run result
    # was overwritten by n=9; the passage still repeats 4x so both flag it)
    assert (got["n_removed"] >= 10).all()
    assert not got["clean_text"].str.contains("shared0").any()


def test_dup_spans_randomized_vs_python_reference(ray_session):
    """Randomized corpora with injected shared passages: the
    distributed mark-and-merge equals a direct python reference
    (per-doc gram membership + run merge), across seeds and both
    hash lanes' min_count accounting."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.dedup import dup_spans

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(400)]
        passages = [" ".join(rng.choice(vocab, size=rng.integers(8, 14)))
                    for _ in range(3)]
        docs = []
        for _ in range(60):
            parts = [" ".join(rng.choice(vocab,
                                         size=rng.integers(0, 20)))]
            if rng.random() < 0.6:
                parts.append(passages[rng.integers(3)])
                parts.append(" ".join(rng.choice(
                    vocab, size=rng.integers(0, 10))))
            docs.append(" ".join(p for p in parts if p))
        n = 6
        words_all = [d.split() for d in docs]
        # python reference: count every n-gram, mark, merge runs
        from collections import Counter

        cnt = Counter()
        for ws in words_all:
            for j in range(len(ws) - n + 1):
                cnt[tuple(ws[j:j + n])] += 1
        want = []
        for di, ws in enumerate(words_all):
            flags = [cnt[tuple(ws[j:j + n])] >= 2
                     for j in range(len(ws) - n + 1)]
            j = 0
            while j < len(flags):
                if flags[j]:
                    k = j
                    while k + 1 < len(flags) and flags[k + 1]:
                        k += 1
                    want.append((di, j + 1, k + n, k + n - j))
                    j = k + 1
                else:
                    j += 1
        want = sorted((d, s, e, e - s + 1) for d, s, e, _ in want)
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
        for lane in ("fast", "verified"):
            out = dup_spans(rd.from_arrow(t).repartition(5), n=n,
                            min_count=2, hash_fn=lane)
            got = sorted(
                (r["doc_id"], r["start_pos"], r["end_pos"], r["n_words"])
                for b in out.iter_batches(batch_format="pyarrow")
                for r in b.to_pylist())
            assert got == want and len(want) > 20, lane


# ---------------------------------------------------------------------------
# AllPairs / PPJoin exact set-similarity self-join
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(pdf, threshold, n=3):
    from xema_ray.stages.dedup import ngram_jaccard

    ids = pdf["doc_id"].tolist()
    texts = pdf["text"].tolist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ngram_jaccard(texts[i], texts[j], n=n) >= threshold:
                a, b = sorted((ids[i], ids[j]))
                want.add((a, b))
    return want


@pytest.mark.parametrize("order", ["df", "hash"])
def test_allpairs_exact_vs_bruteforce(docs_ds, order):
    """Candidates are a guaranteed superset; after exact verification the
    result EQUALS the brute-force all-pairs Jaccard answer (recall certified
    by the prefix-filter theorem, not corpus luck)."""
    ds, pdf = docs_ds
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       verify_pairs_jaccard)

    thr = 0.5
    cands = allpairs_jaccard_pairs(ds, threshold=thr, order=order)
    cand_set = {(r["doc_a"], r["doc_b"])
                for r in cands.take_all()}
    want = _brute_jaccard_pairs(pdf, thr)
    missing = want - {tuple(sorted(p)) for p in cand_set}
    assert not missing, f"prefix filter lost true pairs: {missing}"

    verified = verify_pairs_jaccard(cands, ds, threshold=thr).take_all()
    got = {tuple(sorted((r["doc_a"], r["doc_b"]))) for r in verified}
    assert got == want and len(want) >= 10  # 10 exact-dup pairs at least


def test_allpairs_driver_matches_groupby(docs_ds):
    ds, _ = docs_ds
    from xema_ray.stages.dedup import allpairs_jaccard_pairs

    a = {(r["doc_a"], r["doc_b"]) for r in allpairs_jaccard_pairs(
        ds, threshold=0.6, strategy="driver").take_all()}
    b = {(r["doc_a"], r["doc_b"]) for r in allpairs_jaccard_pairs(
        ds, threshold=0.6, strategy="groupby").take_all()}
    assert a == b and a


def test_allpairs_empty_and_short_docs(ray_session):
    import ray.data as rd
    from xema_ray.stages.dedup import allpairs_jaccard_pairs

    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d", "e"],
        "text": ["", "", "one two", "one two", "totally different words"],
    })
    got = {(r["doc_a"], r["doc_b"]) for r in allpairs_jaccard_pairs(
        rd.from_pandas(pdf), threshold=0.9).take_all()}
    # empty docs share the empty gram (J=1); the short-doc whole-doc gram
    # makes c/d identical singleton sets
    assert ("a", "b") in got and ("c", "d") in got
    assert not any("e" in p for p in got)


def test_allpairs_prefix_smaller_than_full_postings(docs_ds):
    """Prefix rows (what the exchange moves) are strictly fewer than total
    distinct grams — the scale property the prefix filter exists for."""
    import numpy as np
    ds, pdf = docs_ds
    from xema_ray.stages.dedup import _doc_gram_sets

    thr = 0.5
    _, offs = _doc_gram_sets(pdf["text"], 3)
    sizes = np.diff(offs)
    prefix = sizes - np.ceil(thr * sizes - 1e-9).astype(np.int64) + 1
    assert prefix.sum() < 0.6 * sizes.sum()
    assert (prefix >= 1).all() and (prefix <= sizes).all()


def test_neardup_sql_oracles_agree_on_empty_docs(ray_session):
    """Engine-vs-oracle parity on the divergence class the shipped corpora
    happen to lack (code-review r4): zero-token docs — empty string, NULL,
    punctuation-only.  DuckDB's array_to_string([], ' ') is NULL; the
    _GRAMS_CTE coalesce maps them to the shared '' gram so the oracle
    agrees with the engine's empty-gram semantics (J=1 between empty
    docs)."""
    import duckdb
    import ray.data as rd
    from xema_ray.pipelines.queries import _ALLPAIRS_SQL, _MINHASH_SQL
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       minhash_lsh_pairs,
                                       verify_pairs_jaccard)

    pdf = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "text": ["", None, "!!! ...", "alpha beta gamma delta",
                 "alpha beta gamma delta", "unrelated words here now"],
    })
    con = duckdb.connect()
    con.register("documents", pdf)

    def run_sql(sql):
        df = con.execute(sql).fetchdf()
        return {(int(a), int(b), int(j))
                for a, b, j in df.itertuples(index=False)}

    ds = rd.from_pandas(pdf)
    want_ap = run_sql(_ALLPAIRS_SQL)
    # ALL verification lanes — production doc_allpairs_jaccard runs
    # method='hash', so its empty-gram semantics need this pin too
    for method, strategy in (("exact", "broadcast"), ("hash", "broadcast"),
                             ("hash", "bucketed")):
        got_ap = verify_pairs_jaccard(
            allpairs_jaccard_pairs(ds, threshold=0.4), ds,
            threshold=0.4, fixed_point=True, method=method,
            strategy=strategy)
        got_ap = {(int(r["doc_a"]), int(r["doc_b"]), int(r["j_fp"]))
                  for r in got_ap.take_all()}
        assert got_ap == want_ap, (method, strategy)
    # the three zero-token docs pair pairwise at J=1 plus the exact dup
    assert {(1, 2, 1000000), (1, 3, 1000000), (2, 3, 1000000),
            (4, 5, 1000000)} == want_ap

    got_mh = verify_pairs_jaccard(
        minhash_lsh_pairs(ds, threshold=0.45), ds,
        threshold=0.5, fixed_point=True)
    got_mh = {(int(r["doc_a"]), int(r["doc_b"]), int(r["j_fp"]))
              for r in got_mh.take_all()}
    assert got_mh == run_sql(_MINHASH_SQL)


def test_verify_hash_method_matches_exact(docs_ds):
    ds, _ = docs_ds
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       verify_pairs_jaccard)

    cands = allpairs_jaccard_pairs(ds, threshold=0.5)
    a = {(r["doc_a"], r["doc_b"], r["j_fp"]) for r in verify_pairs_jaccard(
        cands, ds, threshold=0.5, fixed_point=True,
        method="exact").take_all()}
    b = {(r["doc_a"], r["doc_b"], r["j_fp"]) for r in verify_pairs_jaccard(
        cands, ds, threshold=0.5, fixed_point=True,
        method="hash").take_all()}
    assert a == b and a


def test_verify_bucketed_matches_broadcast(docs_ds):
    """The driver-free co-partitioned verification lane (round-4 verdict
    item #1) returns the identical verified pair set — including the
    extra pair columns (est_jaccard) — for both fixed_point modes."""
    ds, _ = docs_ds
    from xema_ray.stages.dedup import minhash_lsh_pairs, verify_pairs_jaccard

    cands = minhash_lsh_pairs(ds, threshold=0.45)
    for fp in (False, True):
        rows = [verify_pairs_jaccard(cands, ds, threshold=0.5,
                                     fixed_point=fp, method="hash",
                                     strategy=s).take_all()
                for s in ("broadcast", "bucketed")]
        keyed = [sorted(tuple(sorted(r.items())) for r in part)
                 for part in rows]
        assert keyed[0] == keyed[1] and keyed[0]
        # est_jaccard rides through both lanes
        assert "est_jaccard" in rows[1][0]


def test_verify_bucketed_adversarial_high_duplication(ray_session):
    """Every doc participates in a candidate pair (30 groups x 10
    near-identical docs): the shape where the broadcast gather's driver
    dict would approach the corpus.  The bucketed lane — which never
    builds that dict — still matches the brute-force answer exactly."""
    import ray.data as rd
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       ngram_jaccard, verify_pairs_jaccard)

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(300)]
    ids, texts = [], []
    for g in range(30):
        words = list(rng.choice(vocab, size=30))
        for m in range(10):
            w = list(words)
            if m:  # one-word edit per member
                w[int(rng.integers(len(w)))] = f"e{g}_{m}"
            ids.append(g * 10 + m)
            texts.append(" ".join(w))
    pdf = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                        "text": texts})
    ds = rd.from_pandas(pdf)
    thr = 0.6
    cands = allpairs_jaccard_pairs(ds, threshold=thr)
    got = {(r["doc_a"], r["doc_b"]) for r in verify_pairs_jaccard(
        cands, ds, threshold=thr, method="hash",
        strategy="bucketed").take_all()}
    want = set()
    for i in range(len(pdf)):
        for j in range(i + 1, len(pdf)):
            if ids[i] // 10 == ids[j] // 10:  # cross-group J ~ 0
                if ngram_jaccard(texts[i], texts[j], n=3) >= thr:
                    want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert got == want and len(want) > 1000
    # every doc is a candidate endpoint — the adversarial property
    endpoints = {d for p in want for d in p}
    assert len(endpoints) == len(pdf)


def test_verify_auto_switches_to_bucketed(docs_ds):
    """strategy='auto' with a zero broadcast budget must route the hash
    lane through the bucketed exchange and still agree."""
    ds, _ = docs_ds
    from xema_ray.stages.dedup import minhash_lsh_pairs, verify_pairs_jaccard

    cands = minhash_lsh_pairs(ds, threshold=0.45)
    a = {(r["doc_a"], r["doc_b"], r["j_fp"]) for r in verify_pairs_jaccard(
        cands, ds, threshold=0.5, fixed_point=True,
        method="hash").take_all()}
    b = {(r["doc_a"], r["doc_b"], r["j_fp"]) for r in verify_pairs_jaccard(
        cands, ds, threshold=0.5, fixed_point=True, method="hash",
        auto_broadcast_docs=0).take_all()}
    assert a == b and a


def test_verify_bucketed_missing_and_empty_ids(ray_session):
    """Pairs referencing ids absent from the corpus verify against the
    zero-token gram set in the bucketed lane too (missing, empty) = J=1,
    (missing, non-empty) = J=0 — identical to the broadcast lanes."""
    import ray.data as rd
    from xema_ray.stages.dedup import verify_pairs_jaccard

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["", "alpha beta gamma delta", ""]}))
    pairs = rd.from_pandas(pd.DataFrame({
        "doc_a": ["a", "ghost", "ghost", "a"],
        "doc_b": ["c", "a", "b", "b"]}))
    for strategy in ("broadcast", "bucketed"):
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in verify_pairs_jaccard(
                   pairs, docs, threshold=0.0, method="hash",
                   strategy=strategy).take_all()}
        assert got[("a", "c")] == 1.0, strategy
        assert got[("ghost", "a")] == 1.0, strategy
        assert got[("ghost", "b")] == 0.0, strategy
        assert got[("a", "b")] == 0.0, strategy


def test_verify_bucketed_sliced_matches_broadcast(ray_session):
    """A tiny max_payload_bytes forces the MULTI-SLICE bucketed path
    (r5: each slice is one bounded two-exchange pass so the attached
    gram payload never outgrows the object store) — verified pair set
    identical to the broadcast lane on the adversarial fixture."""
    import ray.data as rd
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       verify_pairs_jaccard)

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(300)]
    ids, texts = [], []
    for g in range(12):
        words = list(rng.choice(vocab, size=30))
        for m in range(6):
            w = list(words)
            if m:
                w[int(rng.integers(len(w)))] = f"e{g}_{m}"
            ids.append(g * 6 + m)
            texts.append(" ".join(w))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.array(ids, dtype="int64"), "text": texts}))
    cands = allpairs_jaccard_pairs(ds, threshold=0.6)
    ref = {(r["doc_a"], r["doc_b"], r["jaccard"])
           for r in verify_pairs_jaccard(
               cands, ds, threshold=0.6, method="hash",
               strategy="broadcast").take_all()}
    got = {(r["doc_a"], r["doc_b"], r["jaccard"])
           for r in verify_pairs_jaccard(
               cands, ds, threshold=0.6, method="hash",
               strategy="bucketed",
               max_payload_bytes=20_000).take_all()}
    assert got == ref and len(ref) > 100


def test_est_pair_emission_counts_key_blocks():
    """Unit: the estimator sums C(m,2) over fine key blocks using the
    same key combine as the coarse-bucket fold."""
    from xema_ray.stages.dedup import _est_pair_emission

    df = pd.DataFrame({"gram": np.array([7, 7, 7, 9, 9, 11], np.int64)})
    # blocks of 3, 2, 1 -> 3 + 1 + 0
    assert _est_pair_emission(df, ["gram"]) == 4.0
    two = pd.DataFrame({"band": np.array([0, 0, 1, 1], np.int64),
                        "band_hash": np.array([5, 5, 5, 5], np.int64)})
    # (0,5)x2 and (1,5)x2 are DIFFERENT blocks -> 1 + 1
    assert _est_pair_emission(two, ["band", "band_hash"]) == 2.0
    # cap = the fold's skew guard: a block of 100 postings the fold
    # truncates to max_bucket=5 emits at most C(5,2), not C(100,2)
    boiler = pd.DataFrame({"gram": np.full(100, 7, np.int64)})
    assert _est_pair_emission(boiler, ["gram"]) == 4950.0
    assert _est_pair_emission(boiler, ["gram"], cap=5) == 10.0


def test_minhash_auto_respects_block_cap_in_emission_gate(ray_session):
    """A boilerplate band bucket larger than max_bucket must NOT trip
    the emission gate: the fold truncates it to C(max_bucket, 2) pairs,
    so the capped estimate keeps the measured-auto driver fold."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages import dedup

    text = "identical boilerplate document body words repeated here"
    n = 40
    ds = rd.from_arrow(pa.table({
        "doc_id": [f"d{i:02d}" for i in range(n)],
        "text": [text] * n}), override_num_blocks=4)

    calls = []
    real = dedup._coarse_groupby

    def spy(rows, key_cols, block_fn, n_buckets=None):
        calls.append(key_cols)
        return real(rows, key_cols, block_fn, n_buckets)

    # uncapped estimate: 16 bands x C(40,2) = 12480 > 4 x 2000; capped
    # at max_bucket=5: 16 x C(5,2) = 160 <= 8000 -> driver fold stays
    import unittest.mock as mock
    with mock.patch.object(dedup, "_coarse_groupby", spy):
        out = dedup.minhash_lsh_pairs(ds, threshold=0.5, max_bucket=5,
                                      strategy="auto",
                                      auto_driver_limit=2000)
        got = {(r["doc_a"], r["doc_b"]) for r in out.take_all()}
    assert not calls, "capped emission estimate still tripped the gate"
    assert got == {(f"d{i:02d}", f"d{j:02d}")
                   for i in range(5) for j in range(i + 1, 5)}


def test_pair_self_join_auto_output_gate_routes_to_groupby(
        ray_session, monkeypatch):
    """Duplication-heavy corpus: the posting INPUT passes the auto
    row/byte gates but the per-gram-block pair emission is quadratic —
    the auto lane must hand the fold to the distributed groupby lane
    (r5 20x stress: 4M postings under the input gates emitted 123M raw
    pairs in the driver fold, a 12 GB private driver heap)."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages import dedup

    n = 60
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": ["alpha beta gamma delta"] * n})
    ds = rd.from_arrow(tbl, override_num_blocks=4)

    calls = []
    real = dedup._coarse_groupby

    def spy(rows, key_cols, block_fn, n_buckets=None):
        calls.append(key_cols)
        return real(rows, key_cols, block_fn, n_buckets)

    monkeypatch.setattr(dedup, "_coarse_groupby", spy)
    # 120 posting rows <= limit 600, but est emission
    # 2 grams x C(60,2) = 3540 > 4 x 600
    got = {(r["doc_a"], r["doc_b"]) for r in dedup.allpairs_jaccard_pairs(
        ds, threshold=0.5, strategy="auto",
        auto_driver_limit=600).take_all()}
    assert calls, "auto lane kept the quadratic fold on the driver"
    want = {(r["doc_a"], r["doc_b"]) for r in dedup.allpairs_jaccard_pairs(
        ds, threshold=0.5, strategy="driver").take_all()}
    assert got == want == {(i, j) for i in range(n)
                           for j in range(i + 1, n)}
