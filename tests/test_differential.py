"""Fresh-seed full differential: the fused checkpoint runner's every
output (verdicts, per-keyword counts, duplicate ids, referential count,
column stats) vs DuckDB on a corpus generated with a seed the rest of the
suite never uses — guards against seed-42-specific coincidences."""

import shutil
import tempfile

import duckdb
import pytest

from xema_ray.sources.corpus import corpus_paths, write_corpus


def test_fused_runner_matches_duckdb_on_fresh_seed(ray_session, tmp_path):
    from xema_ray.state.checkpoint import run_validation

    d = write_corpus("/tmp/xema_diff_seed11", 20_000, n_files=4, seed=11)
    s = run_validation(corpus_paths(d), str(tmp_path / "out"), with_checks=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW seq AS SELECT * FROM read_parquet('{d}/seq-*.parquet')")
    inv = con.execute("""
     SELECT count(*) FROM seq WHERE NOT (
       doc_id IS NOT NULL AND tokens IS NOT NULL AND n_tok IS NOT NULL
       AND source IS NOT NULL
       AND length(doc_id) BETWEEN 5 AND 64
       AND regexp_matches(doc_id, '^[a-z][a-z-]*-[0-9]{12}$')
       AND len(tokens) BETWEEN 1 AND 4096
       AND NOT EXISTS (SELECT 1 FROM unnest(seq.tokens) AS u(tok)
                       WHERE u.tok < 0 OR u.tok >= 50257)
       AND n_tok BETWEEN 1 AND 4096
       AND source IN ('web','books','code','wiki','forums')
       AND n_tok = len(tokens))""").fetchone()[0]
    assert s.rows - s.valid_rows == inv

    dups = dict(con.execute(
        "SELECT doc_id, count(*) FROM seq WHERE doc_id IS NOT NULL "
        "GROUP BY doc_id HAVING count(*)>1").fetchall())
    assert s.duplicate_ids == dups

    ref = con.execute(
        "SELECT count(*) FROM seq WHERE source IS NOT NULL AND source NOT IN "
        "('web','books','code','wiki','forums')").fetchone()[0]
    assert s.report["referential_violations"] == ref

    st = s.report["column_stats"]["n_tok"]
    row = con.execute("SELECT count(*), count(*)-count(n_tok), min(n_tok), "
                      "max(n_tok), avg(n_tok) FROM seq").fetchone()
    assert (st["count"], st["nulls"], st["min"], st["max"]) == row[:4]
    assert abs(st["mean"] - row[4]) < 1e-9

    kw_sql = {
        "validator": con.execute(
            "SELECT count(*) FROM seq WHERE n_tok IS NOT NULL AND tokens IS NOT NULL "
            "AND n_tok <> len(tokens)").fetchone()[0],
        "minimum": con.execute(
            "SELECT count(*) FROM (SELECT unnest(tokens) t FROM seq "
            "WHERE tokens IS NOT NULL) WHERE t < 0").fetchone()[0],
        "exclusive_maximum": con.execute(
            "SELECT count(*) FROM (SELECT unnest(tokens) t FROM seq "
            "WHERE tokens IS NOT NULL) WHERE t >= 50257").fetchone()[0],
    }
    for k, v in kw_sql.items():
        assert s.keyword_counts.get(k, 0) == v, (k, s.keyword_counts.get(k), v)
