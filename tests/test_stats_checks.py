"""Stats engine + table-level checks vs DuckDB oracle on the synthetic
corpus (uniqueness, referential, stats, drift)."""

import os

import duckdb
import numpy as np
import pytest

from xema_ray.sources.corpus import SOURCES, corpus_paths, write_corpus

CORPUS = "/tmp/xema_test_corpus"  # shared with test_validate_dataset
N_ROWS = 20_000


@pytest.fixture(scope="module")
def corpus_dir():
    return write_corpus(CORPUS, N_ROWS, n_files=4, seed=42)


@pytest.fixture(scope="module")
def ds(ray_session, corpus_dir):
    import ray.data as rd

    return rd.read_parquet(corpus_paths(corpus_dir))


@pytest.fixture(scope="module")
def con(corpus_dir):
    c = duckdb.connect()
    glob = os.path.join(corpus_dir, "seq-*.parquet")
    c.execute(f"CREATE VIEW seq AS SELECT * FROM read_parquet('{glob}')")
    return c


def test_column_stats_match_duckdb(ds, con):
    from xema_ray.stages.stats import column_stats

    stats = column_stats(ds)
    row = con.execute("""
        SELECT count(*), count(*) - count(n_tok), min(n_tok), max(n_tok),
               avg(n_tok), count(DISTINCT doc_id), count(DISTINCT source)
        FROM seq
    """).fetchone()
    n, ntok_nulls, mn, mx, avg, d_doc, d_src = row
    assert stats["n_tok"]["count"] == n
    assert stats["n_tok"]["nulls"] == ntok_nulls
    assert stats["n_tok"]["min"] == mn
    assert stats["n_tok"]["max"] == mx
    assert abs(stats["n_tok"]["mean"] - avg) < 1e-9
    # HLL estimates within 3%
    assert abs(stats["doc_id"]["distinct"] - d_doc) / d_doc < 0.03
    assert stats["source"]["distinct"] == d_src  # tiny cardinality → exact-ish
    # list column stats = length stats
    lrow = con.execute("SELECT min(len(tokens)), max(len(tokens)) FROM seq").fetchone()
    assert stats["tokens"]["min"] == lrow[0]
    assert stats["tokens"]["max"] == lrow[1]


def test_duplicate_doc_ids_match_duckdb(ds, con):
    from xema_ray.stages.checks import duplicate_values

    got = {r["doc_id"]: r["n_occurrences"] for r in duplicate_values(ds, "doc_id").take_all()}
    want = dict(con.execute(
        "SELECT doc_id, count(*) FROM seq WHERE doc_id IS NOT NULL "
        "GROUP BY doc_id HAVING count(*) > 1"
    ).fetchall())
    assert got == want
    assert len(got) > 0  # injection rate 1e-3 → ~20 dups expected


def test_duplicate_values_groupby_strategy(ds, con):
    """The cluster-path bucket-groupby merge equals the driver merge."""
    from xema_ray.stages.checks import duplicate_values

    got = {r["doc_id"]: r["n_occurrences"]
           for r in duplicate_values(ds, "doc_id", strategy="groupby").take_all()}
    want = dict(con.execute(
        "SELECT doc_id, count(*) FROM seq WHERE doc_id IS NOT NULL "
        "GROUP BY doc_id HAVING count(*) > 1"
    ).fetchall())
    assert got == want


def test_referential_matches_duckdb(ds, con):
    from xema_ray.sources.corpus import sources_dim_table
    from xema_ray.stages.checks import referential_violations

    viol = referential_violations(ds, sources_dim_table(), col="source").take_all()
    want = con.execute(
        "SELECT count(*) FROM seq WHERE source IS NOT NULL AND source NOT IN "
        "('web','books','code','wiki','forums')"
    ).fetchone()[0]
    assert len(viol) == want
    assert all(v["keyword"] == "ref" for v in viol)


def test_drift_flags_shifted_web_only(ray_session):
    import ray.data as rd

    from xema_ray.stages.checks import capture_reference, drift_report

    ref_dir = write_corpus("/tmp/xema_drift_ref", 30_000, n_files=2, seed=42, clean=True)
    cur_dir = write_corpus("/tmp/xema_drift_cur", 30_000, n_files=2, seed=43,
                           shifted=True, clean=True)
    ref = capture_reference(rd.read_parquet(corpus_paths(ref_dir)))
    rep = drift_report(rd.read_parquet(corpus_paths(cur_dir)), ref)
    assert rep["web"]["drifted"], rep
    for k in ("books", "code", "wiki"):
        assert not rep[k]["drifted"], (k, rep[k])


def test_grouped_histogram_totals(ds, con):
    from xema_ray.stages.stats import grouped_length_histograms

    hists = grouped_length_histograms(ds)
    want = dict(con.execute(
        "SELECT source, count(*) FROM seq WHERE source IS NOT NULL AND tokens IS NOT NULL "
        "GROUP BY source"
    ).fetchall())
    got = {k: h.total for k, h in hists.items()}
    assert got == want


def test_duplicate_values_auto_picks_groupby(ds, con):
    """r2: auto strategy measures Sigma-distinct and switches to the
    hash-range groupby merge above the limit; results identical."""
    from xema_ray.stages.checks import duplicate_values

    want = {(r[0], r[1]) for r in con.execute(
        "SELECT doc_id, count(*) FROM seq GROUP BY doc_id HAVING count(*)>1"
    ).fetchall()}
    got = {(r["doc_id"], r["n_occurrences"]) for r in
           duplicate_values(ds, "doc_id", strategy="auto",
                            auto_driver_limit=0).take_all()}
    assert got == want


def test_duplicate_values_mostly_duplicate_corpus(ray_session):
    """Adversarial shape (VERDICT r3 #4): a corpus that is MOSTLY
    duplicates.  The resolve merge must not fold per-row state on the
    driver — the groupby lane routes (value, cnt, bucket) partials
    through the same coarse-bucket exchange as the blob merge."""
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.checks import duplicate_values

    n = 50_000
    ids = [f"dup-{i % 100:03d}" for i in range(n - 5)] + \
        [f"uniq-{i}" for i in range(5)]
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(8)
    want = {f"dup-{i:03d}": (n - 5) // 100 + (1 if i < (n - 5) % 100 else 0)
            for i in range(100)}
    for strategy in ("driver", "groupby"):
        got = {r["doc_id"]: r["n_occurrences"] for r in duplicate_values(
            ds, "doc_id", strategy=strategy).take_all()}
        assert got == want, strategy


def test_column_stats_tree_strategy_matches_driver(ds, con):
    """r2: the tree-reduce cluster path folds partials distributed and
    produces identical stats to the driver merge."""
    from xema_ray.stages.checks import capture_reference
    from xema_ray.stages.stats import column_stats, grouped_length_histograms

    a = column_stats(ds, columns=["n_tok"], strategy="driver")
    b = column_stats(ds, columns=["n_tok"], strategy="tree")
    assert a == b
    ha = grouped_length_histograms(ds, strategy="driver")
    hb = grouped_length_histograms(ds, strategy="tree")
    assert sorted(ha) == sorted(hb)
    for k in ha:
        assert (ha[k].counts == hb[k].counts).all()


def test_hopping_windows_overlap_coverage(ray_session):
    """Each event lands in exactly size/hop overlapping windows and the
    per-window totals sum to n_events x (size/hop)."""
    import pandas as pd
    import ray.data as rd

    from xema_ray.stages.windows import hopping_window_counts

    ts = pd.to_datetime([0, 1_000, 2_500, 3_599, 3_600, 7_199], unit="s")
    ds = rd.from_pandas(pd.DataFrame({"ts": ts, "value": [1.0] * 6}))
    out = hopping_window_counts(ds, size_s=3600, hop_s=900).take_all()
    total = sum(r["n"] for r in out)
    assert total == 6 * 4  # size/hop = 4 windows per event
    # the window starting at 0 covers events at 0s,1000s,2500s,3599s
    w0 = next(r for r in out if r["window_start"] == 0)
    assert w0["n"] == 4 and w0["sum_value_m"] == 4_000_000


def test_token_frequencies_tree_matches_driver(ds, con):
    """Bincount-partial token frequencies: tree fold == driver fold ==
    DuckDB exact counts."""
    import numpy as np

    from xema_ray.stages.stats import token_frequencies

    a = token_frequencies(ds, strategy="driver")
    b = token_frequencies(ds, strategy="tree")
    assert (a == b).all()
    want = dict(con.execute(
        "SELECT tok, count(*) FROM (SELECT unnest(tokens) AS tok FROM seq "
        "WHERE tokens IS NOT NULL) WHERE tok >= 0 AND tok < 50257 "
        "GROUP BY tok ORDER BY tok").fetchall())
    got_nonzero = {int(t): int(c) for t, c in enumerate(a) if c}
    assert got_nonzero == {int(k): int(v) for k, v in want.items()}


def test_top_words_exact_matches_bruteforce(ray_session):
    """Misra-Gries two-pass exact top-k == brute-force counts, including
    with a tiny sketch capacity (the exact recount repairs sketch error
    as long as candidates cover the true top-k)."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.stats import top_words_exact

    rng = np.random.default_rng(33)
    # skewed vocabulary: a few hot words + a long uniform tail
    hot = [f"hot{i}" for i in range(10)]
    tail = [f"w{i}" for i in range(3000)]
    docs = []
    for _ in range(800):
        words = list(rng.choice(hot, size=rng.integers(3, 10))) + \
            list(rng.choice(tail, size=rng.integers(5, 15)))
        rng.shuffle(words)
        docs.append(" ".join(words))
    truth = Counter()
    for d in docs:
        truth.update(d.split())
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    out = top_words_exact(
        rd.from_arrow(pa.table({"text": pa.array(docs)})),
        k=15, capacity=256)
    got = list(zip(out["word"].to_pylist(), out["n"].to_pylist()))
    assert got == want


def test_key_skew_report_exact_vs_bruteforce(ray_session):
    """Two-pass skew report == brute-force counts with a tiny sketch
    capacity (forces per-batch AND driver-side MG shrink), across
    multiple blocks so the coalesced-batch total path is exercised."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.stats import key_skew_report

    rng = np.random.default_rng(7)
    # zipf-ish: hot keys 0..9, uniform tail
    keys = np.concatenate([
        rng.integers(0, 10, size=4000),
        rng.integers(10, 2000, size=6000),
    ])
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys, pa.int64())})) \
        .repartition(7)
    # k=10 keeps the ask inside the certification bound (hot counts
    # ~400 > total/capacity ~156); k into the uniform tail must refuse
    out = key_skew_report(ds, key="user_id", k=10, capacity=64)
    u, c = np.unique(keys, return_counts=True)
    order = np.lexsort((u, -c))[:10]
    assert out["user_id"].to_pylist() == list(u[order])
    assert out["n"].to_pylist() == list(c[order])
    total = len(keys)
    assert out["share_ppm"].to_pylist() == \
        [int(n) * 1_000_000 // total for n in c[order]]
    assert out["rank"].to_pylist() == list(range(1, 11))
    with pytest.raises(ValueError, match="not certified"):
        key_skew_report(ds, key="user_id", k=12, capacity=64)


def test_key_skew_report_uniform_batches_keep_total(ray_session):
    """Regression (code-review r4): a batch whose MG shrink empties the
    partial (all counts tied, distinct > capacity) must still contribute
    its row count to `total` — it rides a flagged meta row — and a fully
    uniform corpus must REFUSE, not return an empty report."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.stats import key_skew_report

    uniform = pa.table({"user_id": pa.array(
        np.arange(5000, dtype=np.int64))})          # shrink empties
    hot = pa.table({"user_id": pa.array(
        np.full(5000, 7, dtype=np.int64))})
    ds = rd.from_arrow([uniform, hot])
    out = key_skew_report(ds, key="user_id", k=1, capacity=64)
    assert out["user_id"].to_pylist() == [7]
    assert out["n"].to_pylist() == [5001]
    # total must include the uniform batch's 5000 rows: 5001/10000
    assert out["share_ppm"].to_pylist() == [5001 * 1_000_000 // 10000]
    # fully uniform corpus: nothing certifiable -> explicit refusal
    with pytest.raises(ValueError, match="not certified"):
        key_skew_report(rd.from_arrow([uniform]), key="user_id", k=5,
                        capacity=64)


def test_key_skew_report_nulls_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.stats import key_skew_report

    t = pa.table({"user_id": pa.array([5, None, 5, 3, None], pa.int64())})
    out = key_skew_report(rd.from_arrow(t), key="user_id", k=5)
    assert out["user_id"].to_pylist() == [5, 3]
    assert out["n"].to_pylist() == [2, 1]
    # nulls excluded from the share denominator (SQL twin filters them)
    assert out["share_ppm"].to_pylist() == [666666, 333333]
    empty = pa.table({"user_id": pa.array([], pa.int64())})
    out2 = key_skew_report(rd.from_arrow(empty), key="user_id", k=5)
    assert out2.num_rows == 0
    assert out2.column_names == ["rank", "user_id", "n", "share_ppm"]


def test_key_skew_report_coverage_certifies_small_vocab(ray_session):
    """Regression (code-review r4): when the candidate recounts cover
    the WHOLE corpus (distinct keys < capacity, sketch exact), the
    top-k is provably exact even if the k-th count is under
    total/capacity — must not refuse."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.stats import key_skew_report

    keys = np.concatenate([np.full(200_000, 1, np.int64),
                           np.repeat(np.arange(2, 101, dtype=np.int64), 50)])
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys)}))
    out = key_skew_report(ds, key="user_id", k=15, capacity=4096)
    assert out["user_id"].to_pylist()[0] == 1
    assert out["n"].to_pylist() == [200_000] + [50] * 14
