"""BM25 integer-surrogate search (stages/search.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_bm25(docs, terms, k=10):
    """Row-at-a-time replica of the documented integer formulas."""
    import re

    tok = [re.findall(r"[a-z0-9]+", (t or "").lower()) for _, t in docs]
    n = len(docs)
    tot = sum(len(w) for w in tok)
    a = (10 * tot) // n
    df = {t: sum(1 for w in tok if t in w) for t in terms}
    out = []
    for (doc_id, _), words in zip(docs, tok):
        dl = len(words)
        score = 0
        for t in terms:
            tf = words.count(t)
            if tf == 0:
                continue
            idf_s = ((2 * (n - df[t]) + 1) * 1_000_000) // (2 * df[t] + 1)
            tfq = (22_000 * a * tf) // (10 * a * tf + 3 * a + 90 * dl)
            score += idf_s * tfq
        if score > 0:
            out.append((doc_id, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


DOCS = [
    ("a", "apple banana apple cherry"),
    ("b", "banana banana banana banana banana banana"),
    ("c", "apple"),
    ("d", "cherry dog elephant fox grape house igloo jam kite lemon "
          "mango nut orange pear quilt rose sun tree urn vine"),
    ("e", None),
    ("f", "apple apple apple apple apple apple apple apple"),
    ("g", "dog apple"),
]


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.string()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(3)


def test_bm25_matches_brute_force(ray_session):
    from xema_ray.stages.search import bm25_topk

    terms = ["apple", "banana", "dog"]
    got = bm25_topk(_ds(DOCS), terms, k=10).to_pandas()
    want = _brute_bm25(DOCS, terms, k=10)
    assert list(zip(got["doc_id"], got["score"])) == want
    # rarer term (dog: df=2) outweighs common apple (df=4) at equal tf
    assert got["score"].is_monotonic_decreasing


def test_bm25_length_normalization_and_saturation(ray_session):
    from xema_ray.stages.search import bm25_topk

    got = bm25_topk(_ds(DOCS), ["apple"], k=10).to_pandas()
    ids = list(got["doc_id"])
    # tf=8 doc wins, but saturates: score(f) < 8x score(c)
    assert ids[0] == "f"
    s = dict(zip(got["doc_id"], got["score"]))
    assert s["f"] < 8 * s["c"]
    # same tf=1: shorter doc ("c", dl=1) beats longer ("g", dl=2)
    assert s["c"] > s["g"]


def test_bm25_k_cut_and_missing_term(ray_session):
    from xema_ray.stages.search import bm25_topk

    got = bm25_topk(_ds(DOCS), ["apple"], k=2).to_pandas()
    assert len(got) == 2
    none = bm25_topk(_ds(DOCS), ["zzzz"], k=5).to_pandas()
    assert len(none) == 0


def test_bm25_empty_corpus(ray_session):
    from xema_ray.stages.search import bm25_topk
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    got = bm25_topk(ds, ["apple"], k=3)
    assert got.num_rows == 0
    assert got.schema.field("doc_id").type == pa.string()


def test_bm25_stats_reuse(ray_session):
    from xema_ray.stages.search import bm25_topk, corpus_term_stats

    terms = ["apple", "banana"]
    ds = _ds(DOCS)
    stats = corpus_term_stats(ds, terms)
    n, tot, df = stats
    assert n == len(DOCS)
    assert df["apple"] == 4 and df["banana"] == 2
    a = bm25_topk(ds, terms, k=5).to_pandas()
    b = bm25_topk(ds, terms, k=5, stats=stats).to_pandas()
    assert a.equals(b)
