"""End-to-end Dataset validation on the synthetic corpus, with a DuckDB
oracle recomputing every check in SQL on the same Parquet files."""

import os

import duckdb
import pytest

from xema_ray.sources.corpus import write_corpus

CORPUS = "/tmp/xema_test_corpus"
N_ROWS = 20_000


@pytest.fixture(scope="module")
def corpus_dir():
    return write_corpus(CORPUS, N_ROWS, n_files=4, seed=42)


@pytest.fixture(scope="module")
def result(ray_session, corpus_dir):
    from xema_ray.pipelines.flagship import validate_corpus
    from xema_ray.sources.corpus import corpus_paths

    return validate_corpus(corpus_paths(corpus_dir), batch_size=4096, concurrency=2)


def test_verdict_matches_duckdb_oracle(result, corpus_dir):
    verdict = result.verdict()
    con = duckdb.connect()
    glob = os.path.join(corpus_dir, "seq-*.parquet")
    oracle_invalid = con.execute(f"""
        SELECT count(*) FROM read_parquet('{glob}')
        WHERE NOT (
            doc_id IS NOT NULL AND tokens IS NOT NULL
            AND n_tok IS NOT NULL AND source IS NOT NULL
            AND regexp_matches(doc_id, '^[a-z][a-z-]*-[0-9]{{12}}$')
            AND length(doc_id) BETWEEN 5 AND 64
            AND len(tokens) BETWEEN 1 AND 4096
            AND NOT EXISTS (SELECT 1 FROM unnest(tokens) AS t(tok)
                            WHERE tok < 0 OR tok >= 50257)
            AND n_tok BETWEEN 1 AND 4096
            AND source IN ('web','books','code','wiki','forums')
            AND n_tok = len(tokens)
        )
    """).fetchone()[0]
    assert verdict["rows"] == N_ROWS
    assert verdict["invalid_rows"] == oracle_invalid
    assert not verdict["pass"]


def test_violations_dataset(result):
    pdf = result.violations().to_pandas()
    assert set(pdf.columns) == {"doc_id", "path", "keyword", "message", "source"}
    assert (pdf["keyword"].isin(
        ["minimum", "exclusive_maximum", "required", "enum", "validator",
         "pattern", "min_length", "max_length", "min_items", "max_items"]
    )).all()
    # token element violations carry element paths
    elem = pdf[pdf["path"].str.startswith("/tokens/")]
    assert len(elem) > 0


def test_clean_split(result):
    verdict = result.verdict()
    clean = result.clean()
    assert clean.count() == verdict["valid_rows"]
    assert "valid" not in clean.schema().names


def test_token_array_equality_invariant(result, corpus_dir):
    """Per-row invariant (BASELINE.json input_hint): violation rows point at
    token arrays byte-identical to the fixture rows with the same doc_id."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    import pandas as pd

    inv = result.annotated.map_batches(
        lambda t: t.filter(pc.equal(t["valid"], False)).select(["doc_id", "tokens"]),
        batch_format="pyarrow",
    )
    # ragged list columns don't round-trip Ray's pandas TensorArray; gather
    # as Arrow batches instead
    parts = [b.to_pandas() for b in inv.iter_batches(batch_format="pyarrow")]
    ann = pd.concat(parts, ignore_index=True)
    from xema_ray.sources.corpus import corpus_paths
    import pyarrow as pa
    fixture = pa.concat_tables([pq.read_table(p, columns=["doc_id", "tokens"])
                                for p in corpus_paths(CORPUS)]).to_pandas()
    fixture_map = dict(zip(fixture["doc_id"], fixture["tokens"]))
    checked = 0
    for did, toks in zip(ann["doc_id"], ann["tokens"]):
        if did is None or did not in fixture_map:
            continue
        ref = fixture_map[did]
        if ref is None or toks is None:
            continue
        assert list(toks) == list(ref)
        checked += 1
        if checked >= 200:
            break
    assert checked > 0


def test_task_executor_matches_actor_pool(ray_session, corpus_dir):
    """executor='tasks' (per-worker cached validator, no actor-pool
    spin-up — r5 VERDICT item 6) produces identical violations, clean
    rows and verdicts to the default actor-pool lane."""
    from xema_ray.pipelines.flagship import (n_tok_invariant,
                                             sequences_schema)
    from xema_ray.sources.corpus import corpus_paths
    from xema_ray.stages.validate import validate_dataset

    import ray.data as rd

    ds = rd.read_parquet(corpus_paths(corpus_dir))
    outs = {}
    for ex in ("actors", "tasks"):
        res = validate_dataset(ds, sequences_schema(),
                               table_checks=[n_tok_invariant()],
                               batch_size=4096, executor=ex,
                               id_col="doc_id")
        viol = sorted(
            (str(r["doc_id"]), r["path"], r["keyword"])
            for r in res.violations().take_all())
        clean = res.clean().count()
        outs[ex] = (viol, clean)
    assert outs["actors"] == outs["tasks"]
    assert outs["tasks"][0]  # corpus plants violations
