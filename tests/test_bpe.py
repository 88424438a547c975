"""BPE training/encoding (stages/bpe.py) — classic-example parity,
naive-recount differential, encode invariants, distributed fold."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from xema_ray.stages.bpe import (END, bpe_merges_from_counts, encode_word,
                                 learn_bpe, merges_table)


def _naive_merges(word_counts: dict, n_merges: int):
    """Reference implementation: full pair recount every round (no
    incremental index) — the differential target."""
    vocab = {tuple(w) + (END,): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], pairs[best]))
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


class TestTraining:
    def test_classic_sennrich_example(self):
        c = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        m = bpe_merges_from_counts(list(c), list(c.values()), n_merges=3)
        assert [(l, r) for _, l, r, _ in m] == \
            [("e", "s"), ("es", "t"), ("est", END)]
        assert [n for _, _, _, n in m] == [9, 9, 9]

    def test_incremental_matches_naive_recount(self):
        rng = np.random.default_rng(7)
        words = ["".join(rng.choice(list("abcde"), size=rng.integers(1, 8)))
                 for _ in range(300)]
        counts = Counter(words)
        inc = bpe_merges_from_counts(list(counts), list(counts.values()),
                                     n_merges=60)
        ref = _naive_merges(dict(counts), 60)
        assert inc == ref

    def test_bytes_input_and_early_stop(self):
        m = bpe_merges_from_counts(
            np.array([b"ab"], dtype="S2"), np.array([1]), n_merges=50)
        # "ab</w>" admits exactly 2 merges before one symbol remains
        assert len(m) == 2
        assert m[0][1:3] == ("a", "b")

    def test_min_count_floor(self):
        c = {"aa": 10, "bc": 1}
        m = bpe_merges_from_counts(list(c), list(c.values()),
                                   n_merges=10, min_count=2)
        assert all(n >= 2 for _, _, _, n in m)


class TestEncode:
    def _ranks(self):
        c = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        m = bpe_merges_from_counts(list(c), list(c.values()), n_merges=12)
        return {(l, r): k for k, l, r, _ in m}

    def test_roundtrip_concat(self):
        ranks = self._ranks()
        for w in ["low", "lower", "lowest", "newest", "widest", "zq"]:
            sym = encode_word(w, ranks)
            assert "".join(sym) == w + END

    def test_trained_words_fully_merge_more(self):
        ranks = self._ranks()
        # a trained frequent word compresses below char count
        assert len(encode_word("newest", ranks)) < len("newest") + 1
        # an all-OOV-alphabet word stays at the char level
        assert len(encode_word("zq", ranks)) == 3


@pytest.mark.usefixtures("ray_session")
class TestDistributed:
    def test_learn_matches_local_counts(self):
        import ray.data as rd

        texts = ["the low road", "the lower road", "newest of the new",
                 "widest road"] * 5
        ds = rd.from_arrow(pa.table({"text": texts}),
                           override_num_blocks=4)
        got = learn_bpe(ds, n_merges=25)
        wc = Counter(w for t in texts for w in t.split())
        want = bpe_merges_from_counts(list(wc), list(wc.values()),
                                      n_merges=25)
        assert got == want

    def test_doc_stats_cache_and_carry(self):
        import ray.data as rd

        from xema_ray.stages.bpe import bpe_doc_stats

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2], "source": ["a", "b"],
            "text": ["low lower", "newest"]}))
        m = learn_bpe(ds, n_merges=10)
        out = pa.concat_tables([
            b for b in bpe_doc_stats(ds, m)
            .iter_batches(batch_format="pyarrow")]).sort_by("doc_id")
        assert out["source"].to_pylist() == ["a", "b"]
        assert out["n_words"].to_pylist() == [2, 1]
        ranks = {(l, r): k for k, l, r, _ in m}
        want = [len(encode_word("low", ranks))
                + len(encode_word("lower", ranks)),
                len(encode_word("newest", ranks))]
        assert out["n_subwords"].to_pylist() == want

    def test_merges_table_schema(self):
        t = merges_table([(0, "a", "b", 3)])
        assert t.column_names == ["rank", "left", "right", "n"]
        assert t["n"].to_pylist() == [3]


class TestBpeProperties:
    def test_random_tables_roundtrip_and_differential(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.dictionaries(
            st.text(alphabet="abcdef", min_size=1, max_size=7),
            st.integers(min_value=1, max_value=50),
            min_size=1, max_size=20),
            st.integers(min_value=1, max_value=30))
        def check(table, n_merges):
            inc = bpe_merges_from_counts(list(table), list(table.values()),
                                         n_merges=n_merges)
            ref = _naive_merges(dict(table), n_merges)
            assert inc == ref
            ranks = {(l, r): k for k, l, r, _ in inc}
            for w in table:
                assert "".join(encode_word(w, ranks)) == w + END

        check()


def test_bpe_sql_replay_matches_engine_on_random_corpus(ray_session,
                                                        tmp_path):
    """The generated CTE chain (the doc_bpe_merges oracle) replays
    training EXACTLY on a corpus it was never pinned against, at a
    different merge count — locks the SQL-replay equivalence (pair
    count, total-order argmax, double-space merge) as a property, not
    a fixture."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from xema_ray.pipelines.queries import _bpe_merges_sql
    from xema_ray.stages.bpe import learn_bpe, merges_table

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "router",
             "rerouted", "routing", "xy", "zq"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
            for _ in range(300)]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(docs)})
    f = str(tmp_path / "documents.parquet")
    pq.write_table(t, f)

    engine = merges_table(
        learn_bpe(rd.from_arrow(t), n_merges=12)).to_pylist()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{f}')")
    sql = con.execute(_bpe_merges_sql(12)).fetchall()
    got = [(r["rank"], r["left"], r["right"], r["n"]) for r in engine]
    assert got == [(int(a), b, c, int(d)) for a, b, c, d in sql]
    assert len(got) == 12
