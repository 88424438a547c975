"""Text-analysis stages: langid on known-language samples, quality
signals, token counts, fingerprints."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SAMPLES = {
    "en": "the cat sat on the mat and it was not very happy with this at all",
    "de": "der hund und die katze sind nicht mit dem auto zu dem haus gefahren",
    "fr": "le chien et les chats ne sont pas dans la maison avec une souris",
    "es": "el perro y los gatos no están en la casa con una taza de café",
}


def test_langid_batch():
    from xema_ray.stages.text import LangId

    df = pd.DataFrame({"doc_id": list(SAMPLES), "text": list(SAMPLES.values())})
    out = LangId()(df)
    assert list(out["lang_pred"]) == list(SAMPLES.keys())


def test_langid_unknown_is_und():
    from xema_ray.stages.text import LangId

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["zzz qqq xxx", ""]})
    out = LangId()(df)
    assert list(out["lang_pred"]) == ["und", "und"]


def test_token_count_and_quality_kernels():
    from xema_ray.stages.text import quality_score_batch, token_count_batch

    tbl = pa.table({"text": ["Hello world 42", "", "a-b c"]})
    out = token_count_batch(tbl)
    assert out["n_words"].to_pylist() == [3, 0, 3]
    assert out["n_chars_text"].to_pylist() == [14, 0, 5]
    q = quality_score_batch(tbl)
    assert q["alpha_ratio"].to_pylist()[0] == pytest.approx(10 / 14, abs=1e-6)
    assert q["digit_ratio"].to_pylist()[0] == pytest.approx(2 / 14, abs=1e-6)
    assert q["alpha_ratio"].to_pylist()[1] == 0.0


def test_normalize_text_batch():
    from xema_ray.stages.text import normalize_text_batch

    e_acute = chr(0xE9)                  # precomposed
    e_dec = "e" + chr(0x301)             # decomposed pair
    tbl = pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["  Hello   WORLD \t", "a\n\nb", "", "Caf" + e_acute,
                 "Caf" + e_dec, None],
    })
    out = normalize_text_batch(tbl)
    assert out["norm_text"].to_pylist() == [
        "hello world", "a b", "", "caf" + e_acute, "caf" + e_acute, None]
    assert out["norm_chars"].to_pylist() == [11, 3, 0, 4, 4, None]


def test_fingerprint_stability_and_sensitivity():
    from xema_ray.stages.text import Fingerprint

    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["the quick brown fox jumps over the lazy dog",
                                "the quick brown fox jumps over the lazy dog",
                                "an entirely different document body here"]})
    out1 = Fingerprint()(df)
    out2 = Fingerprint()(df)
    assert list(out1["fingerprint"]) == list(out2["fingerprint"])  # deterministic
    assert out1["fingerprint"][0] == out1["fingerprint"][1]        # same text
    assert out1["fingerprint"][0] != out1["fingerprint"][2]        # diff text


def test_winnow_guarantee_shared_run_shares_fingerprint():
    """Winnowing guarantee: two docs sharing a run of >= window+ngram-1
    words share at least one fingerprint, in both hash modes."""
    import pandas as pd

    from xema_ray.stages.text import WinnowFingerprint

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = 4+3-1
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"unrelated prefix words {shared} and a suffix",
                 f"totally different opening {shared} closing words here",
                 "nothing in common with the others at all"],
    })
    for mode in ("md5", "fast"):
        out = WinnowFingerprint(hash_fn=mode)(df.copy())
        fps = {d: set(out[out.doc_id == d].fp) for d in (1, 2, 3)}
        assert fps[1] & fps[2], mode
        assert not (fps[1] & fps[3]) and not (fps[2] & fps[3]), mode


def test_winnow_empty_and_short_docs():
    import pandas as pd

    from xema_ray.stages.text import WinnowFingerprint

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["a b c d e f g", "x y", "", None]})
    for mode in ("md5", "fast"):
        out = WinnowFingerprint(hash_fn=mode)(df.copy())
        assert sorted(out.doc_id.unique()) == [1, 2, 3, 4], mode
        assert (out.fp.str.len() == 16).all(), mode


def test_bigram_novelty_reference_table_and_edges(ray_session):
    """Train-on-reference / score-candidate shape + empty/short docs."""
    import ray.data as rd

    from xema_ray.stages.text import (bigram_novelty_scores,
                                      global_bigram_counts,
                                      top_bigram_table)

    ref = rd.from_arrow(pa.table({
        "doc_id": ["r1", "r2"],
        "text": ["the cat sat", "the cat ran the cat sat"]}))
    bigrams, counts = global_bigram_counts(ref)
    # "the cat" x3, "cat sat" x2, "cat ran" x1, "ran the" x1
    got = dict(zip([b.decode() for b in bigrams], counts))
    assert got == {"the cat": 3, "cat sat": 2, "cat ran": 1,
                   "ran the": 1}
    table = top_bigram_table(bigrams, counts, k=2)
    assert [b.decode() for b in table] == ["cat sat", "the cat"]

    cand = rd.from_arrow(pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["the cat sat", "dog days here", "one", None]}))
    out = {r["doc_id"]: r for r in
           bigram_novelty_scores(cand, table=table).take_all()}
    assert out["a"]["n_bigrams"] == 2 and out["a"]["n_oov"] == 0
    assert out["b"]["n_bigrams"] == 2 and out["b"]["n_oov"] == 2
    assert out["b"]["oov_m"] == 1_000_000
    assert out["c"]["n_bigrams"] == 0 and out["c"]["oov_m"] == 0
    assert out["d"]["n_bigrams"] == 0 and out["d"]["n_oov"] == 0


# ---------------------------------------------------------------------------
# reference-LM familiarity (CCNet-style integer-exact perplexity stand-in)
# ---------------------------------------------------------------------------


def _py_lm_familiarity(pdf, ref_mod=20):
    """Pure-Python reference: trigram/context counts over the reference
    split, then per-doc floor(mean(floor(1e6*c3/c2)))."""
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    words = {r.doc_id: tok.findall((r.text or "").lower())
             for r in pdf.itertuples()}
    c3, c2 = Counter(), Counter()
    for did, w in words.items():
        if did % ref_mod == 0:
            for i in range(len(w) - 2):
                c3[tuple(w[i:i + 3])] += 1
                c2[tuple(w[i:i + 2])] += 1
    out = {}
    for did, w in words.items():
        n = len(w) - 2
        if n < 1:
            continue
        terms, oov = [], 0
        for i in range(n):
            t3 = tuple(w[i:i + 3])
            if c3[t3]:
                terms.append(int(np.floor(1e6 * c3[t3] / c2[t3[:2]])))
            else:
                terms.append(0)
                oov += 1
        out[did] = (n, oov, int(np.floor(sum(terms) / n)))
    return out


def test_lm_familiarity_matches_python_reference(ray_session):
    import ray.data as rd
    from xema_ray.stages.text import lm_familiarity

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
             for _ in range(120)]
    texts[5] = ""            # empty doc: excluded (no trigram)
    texts[6] = "one two"     # 2 words: excluded
    texts[7] = "zz qq xx"    # all-OOV trigram (unseen words)
    pdf = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                        "text": texts})
    got = {r["doc_id"]: (r["n_tri"], r["n_oov"], r["fam_fp"])
           for r in lm_familiarity(
               rd.from_pandas(pdf).repartition(5), ref_mod=20).take_all()}
    want = _py_lm_familiarity(pdf)
    assert got == want
    assert 5 not in got and 6 not in got
    assert got[7][1] == 1 and got[7][2] == 0   # fully OOV -> fam 0
    # reference docs score high on their own trigrams
    assert got[0][2] > 0


def test_lm_familiarity_empty_reference(ray_session):
    """No doc hits the reference split -> every trigram OOV, fam 0."""
    import ray.data as rd
    from xema_ray.stages.text import lm_familiarity

    pdf = pd.DataFrame({"doc_id": np.array([1, 3, 7], dtype=np.int64),
                        "text": ["a b c d", "b c d e", "x"]})
    rows = {r["doc_id"]: (r["n_tri"], r["n_oov"], r["fam_fp"])
            for r in lm_familiarity(rd.from_pandas(pdf),
                                    ref_mod=1000).take_all()}
    assert rows == {1: (2, 2, 0), 3: (2, 2, 0)}


def test_lm_familiarity_string_doc_ids(ray_session):
    """String-id corpora compose with the LM stage (r4 advice): the
    reference split derives from a stable string hash, scoring matches
    the same corpus re-keyed so that exactly the hash-selected docs are
    the integer reference split."""
    import ray.data as rd
    from xema_ray.functions.sketches import hash_strings
    from xema_ray.stages.text import _ref_split_mask, lm_familiarity

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(80)]
    sids = [f"doc-{i:04d}" for i in range(80)]
    pdf = pd.DataFrame({"doc_id": sids, "text": texts})
    got = {r["doc_id"]: (r["n_tri"], r["n_oov"], r["fam_fp"])
           for r in lm_familiarity(
               rd.from_pandas(pdf).repartition(3), ref_mod=20).take_all()}
    assert len(got) == 80  # no crash, every 12-word doc scored

    # differential check: give hash-selected docs integer ids = 0 mod 20
    mask = _ref_split_mask(pd.Series(sids), 20)
    assert mask.any() and not mask.all()
    assert (mask == ((hash_strings(sids) % np.uint64(20)) == 0)).all()
    ref_ids = np.flatnonzero(mask)
    int_ids = np.arange(80, dtype=np.int64) * 20 + 7  # none divisible
    int_ids[ref_ids] = ref_ids * 20                   # ref split only
    pdf_int = pdf.assign(doc_id=int_ids)
    want = {sids[int(np.flatnonzero(int_ids == k))]: v
            for k, v in _py_lm_familiarity(pdf_int, ref_mod=20).items()}
    assert got == want
