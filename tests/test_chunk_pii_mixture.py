"""Round-3 training-data extensions: document chunking, PII scrubbing,
repetition signals, domain-mixture sampling."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- chunking

def naive_chunks(text, size, stride):
    n = len(text)
    k = 1 if n <= size else -(-(n - size) // stride) + 1
    return [text[i * stride: i * stride + size] for i in range(k)]


@pytest.mark.parametrize("n", [0, 1, 119, 120, 121, 209, 210, 211, 553])
def test_chunk_counts_and_content(n):
    from xema_ray.stages.chunk import chunk_batch

    text = "".join(chr(ord("a") + i % 26) for i in range(n))
    tbl = pa.table({"doc_id": [7], "text": [text]})
    out = chunk_batch(tbl, size=120, stride=90)
    expect = naive_chunks(text, 120, 90)
    assert out["chunk_text"].to_pylist() == expect
    assert out["chunk_id"].to_pylist() == list(range(len(expect)))
    assert out["chunk_len"].to_pylist() == [len(c) for c in expect]


def test_chunk_overlap_reconstructs_document():
    from xema_ray.stages.chunk import chunk_batch

    text = "x" * 37 + "the quick brown fox " * 20
    out = chunk_batch(pa.table({"doc_id": [1], "text": [text]}),
                      size=100, stride=60)
    chunks = out["chunk_text"].to_pylist()
    rebuilt = chunks[0] + "".join(c[100 - 60:] for c in chunks[1:])
    assert rebuilt == text
    # consecutive chunks overlap by size - stride
    for a, b in zip(chunks, chunks[1:]):
        assert a[60:] == b[: len(a) - 60]


def test_chunk_nulls_and_multirow_batch():
    from xema_ray.stages.chunk import chunk_batch

    tbl = pa.table({"doc_id": [1, 2, 3],
                    "text": [None, "ab", "z" * 250]})
    out = chunk_batch(tbl, size=100, stride=75)
    df = out.to_pandas()
    assert list(df[df.doc_id == 1].chunk_text) == [""]   # null → one empty
    assert list(df[df.doc_id == 2].chunk_text) == ["ab"]
    assert list(df[df.doc_id == 3].chunk_len) == [100, 100, 100]


def test_chunk_documents_dataset(ray_session):
    import ray.data as rd

    from xema_ray.stages.chunk import chunk_documents

    ds = rd.from_arrow(pa.table({"doc_id": list(range(10)),
                                 "text": ["w" * (30 * i) for i in range(10)]}))
    out = chunk_documents(ds, size=64, stride=48).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(10):
        assert [r["chunk_text"] for r in sorted(by_doc[i], key=lambda r: r["chunk_id"])] \
            == naive_chunks("w" * (30 * i), 64, 48)


# ---------------------------------------------------------------- PII scrub

def test_pii_scrub_counts_and_redaction():
    from xema_ray.stages.pii import scrub_batch

    tbl = pa.table({"doc_id": [1, 2, 3], "text": [
        "mail bob.smith+x@corp.example.org now",
        "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1",
        "clean text with no pii at all",
    ]})
    out = scrub_batch(tbl)
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ssn"].to_pylist() == [0, 1, 0]
    assert out["n_phone"].to_pylist() == [0, 1, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0]
    s = out["scrubbed"].to_pylist()
    assert s[0] == "mail <EMAIL> now"
    assert s[1] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert s[2] == "clean text with no pii at all"


def test_pii_scrub_chained_order():
    """An email's digits must not be re-matched by later patterns —
    counts are taken on the already-scrubbed text (chained CTE parity)."""
    from xema_ray.stages.pii import scrub_batch

    tbl = pa.table({"text": ["reach 123-45-6789@example.com ok"]})
    out = scrub_batch(tbl)
    assert out["n_email"].to_pylist() == [1]
    assert out["n_ssn"].to_pylist() == [0]
    assert out["scrubbed"].to_pylist() == ["reach <EMAIL> ok"]


def test_pii_scrub_null_text():
    from xema_ray.stages.pii import scrub_batch

    out = scrub_batch(pa.table({"text": [None, "a@b.io"]}))
    assert out["scrubbed"].to_pylist() == ["", "<EMAIL>"]


# ------------------------------------------------------------- repetition

def test_repetition_signals_known_values():
    from xema_ray.stages.text import RepetitionSignals

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "a a a a",            # top word 4/4; 2-grams: aa×3 → dup 2/3
        "w x y z",            # all distinct: top 1/4, dup 0
        "",                   # empty → 0, 0
        "spam spam ham spam", # top 3/4; grams: (s,s),(s,h),(h,s) distinct
    ]})
    out = RepetitionSignals()(df)
    assert list(out["top_word_m"]) == [
        1_000_000, 250_000, 0, 750_000]
    assert list(out["dup2_m"]) == [
        int(np.floor(1e6 * 2 / 3)), 0, 0, 0]


def test_repetition_signals_matches_naive_random():
    from xema_ray.stages.text import RepetitionSignals

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(60)]
    out = RepetitionSignals()(pd.DataFrame(
        {"doc_id": range(60), "text": texts}))
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            top = dup = 0
        else:
            top = int(np.floor(1e6 * max(ws.count(w) for w in set(ws)) / len(ws)))
            grams = list(zip(ws, ws[1:]))
            dup = 0 if not grams else int(
                np.floor(1e6 * (len(grams) - len(set(grams))) / len(grams)))
        assert out["top_word_m"][i] == top, (i, t)
        assert out["dup2_m"][i] == dup, (i, t)


# ---------------------------------------------------------------- mixture

def test_mixture_rates_saturation_and_budget():
    from xema_ray.stages.sample import mixture_rates

    counts = {"a": 10, "b": 1000, "c": 0}
    r = mixture_rates(counts, {"a": 0.5, "b": 0.5}, budget=100.0)
    assert r["a"] == 1.0            # 50 wanted from 10 → keep whole
    assert r["b"] == pytest.approx(0.05)
    assert r["c"] == 0.0


def test_rate_threshold_hex32_edges():
    from xema_ray.stages.sample import rate_threshold_hex32

    assert rate_threshold_hex32(0.0) == "00000000"
    assert rate_threshold_hex32(1.0) == "gggggggg"     # above every hex
    assert rate_threshold_hex32(2.0) == "gggggggg"
    t = rate_threshold_hex32(0.5)
    assert len(t) == 8 and t == "80000000"
    # just-below-1 stays 8 hex chars (no 9-char overflow)
    assert len(rate_threshold_hex32(1 - 2**-53)) == 8


def test_mixture_sample_md5_deterministic_and_weighted(ray_session):
    import ray.data as rd

    from xema_ray.stages.sample import mixture_sample, stratum_counts

    n = 600
    tbl = pa.table({
        "doc_id": list(range(n)),
        "source": [f"s{i % 3}" for i in range(n)],
    })
    ds = rd.from_arrow(tbl)
    counts = stratum_counts(ds, "source")
    assert counts == {"s0": 200, "s1": 200, "s2": 200}
    out = mixture_sample(ds, {"s0": 0.8, "s1": 0.2}, budget=100.0,
                         hash_fn="md5").take_all()
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    # rates: s0=0.4, s1=0.1, s2 (unlisted, default 0) dropped entirely
    assert "s2" not in got
    assert got["s0"] > got["s1"] > 0
    # deterministic replay selects the identical rows
    out2 = mixture_sample(ds, {"s0": 0.8, "s1": 0.2}, budget=100.0,
                          hash_fn="md5").take_all()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    # selection matches the hand-computed md5 rule
    for r in out:
        rate = {"s0": 0.4, "s1": 0.1}[r["source"]]
        thr = format(int(rate * (1 << 32)), "08x")
        assert hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8] < thr


def test_mixture_sample_fast_lane(ray_session):
    import ray.data as rd

    from xema_ray.stages.sample import mixture_sample

    tbl = pa.table({"doc_id": [str(i) for i in range(500)],
                    "source": ["x"] * 250 + ["y"] * 250})
    ds = rd.from_arrow(tbl)
    out = mixture_sample(ds, {"x": 1.0}, budget=50.0, hash_fn="fast",
                         counts={"x": 250, "y": 250}).take_all()
    assert all(r["source"] == "x" for r in out)
    assert 10 < len(out) < 90       # ~50 expected of 250 at rate 0.2


# ------------------------------------------------------- filter pipeline

def test_doc_filter_pipeline_gates_and_null_text(ray_session, tmp_path):
    import itertools

    import pyarrow.parquet as pq

    from xema_ray.pipelines.queries import QUERIES

    # a passing doc: 50 distinct 7-letter words + 2 stopwords
    words = ["".join(c) * 2 + "x" for c in
             itertools.islice(itertools.product("abcdefgh", repeat=3), 50)]
    good = " ".join(words[:25] + ["the"] + words[25:] + ["the"])
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [good,
                 None,                          # null text → dropped
                 "spam " * 60,                  # top-word 100% → dropped
                 "a b"],                        # too short → dropped
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": [len(good), 0, 300, 3],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = QUERIES["doc_filter_pipeline"].fn(str(tmp_path)).take_all()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    assert r["n_words"] == 52 and r["dup2_m"] == 0
    assert r["alpha_m"] > 750000 and r["top_word_m"] < 120000


# -------------------------------------------------------- token chunking

def test_token_chunk_batch_matches_naive():
    from xema_ray.stages.chunk import token_chunk_batch

    rng = np.random.default_rng(3)
    lists = [list(map(int, rng.integers(0, 1000, n)))
             for n in [0, 1, 9, 10, 11, 25, 47]] + [None]
    tbl = pa.table({"doc_id": [f"d{i}" for i in range(8)],
                    "tokens": pa.array(lists, type=pa.list_(pa.int32()))})
    out = token_chunk_batch(tbl, size=10, stride=7).to_pandas()
    assert "d7" not in set(out["doc_id"])          # null list dropped
    for i, toks in enumerate(lists[:-1]):
        rows = out[out.doc_id == f"d{i}"].sort_values("chunk_id")
        expect = [toks[k * 7: k * 7 + 10]
                  for k in range(1 if len(toks) <= 10
                                 else -(-(len(toks) - 10) // 7) + 1)]
        assert list(rows["n_chunk"]) == [len(c) for c in expect]
        assert list(rows["tok_sum"]) == [sum(c) for c in expect]


def test_token_chunk_payload_roundtrip(ray_session):
    import ray.data as rd

    from xema_ray.stages.chunk import chunk_sequences

    toks = list(range(100))
    ds = rd.from_arrow(pa.table({
        "doc_id": ["a"],
        "tokens": pa.array([toks], type=pa.list_(pa.int32()))}))
    rows = []
    for b in chunk_sequences(ds, size=40, stride=30, with_payload=True) \
            .iter_batches(batch_format="pyarrow"):
        rows.extend(b.to_pylist())
    rows.sort(key=lambda r: r["chunk_id"])
    # overlapped windows reconstruct the original stream
    rebuilt = list(rows[0]["chunk_tokens"])
    for r in rows[1:]:
        rebuilt.extend(r["chunk_tokens"][40 - 30:])
    assert rebuilt == toks
