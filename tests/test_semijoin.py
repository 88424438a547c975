"""Bucketed hash anti-join (large-dim referential path) equals the
broadcast path."""

import pytest

from xema_ray.sources.corpus import corpus_paths, sources_dim_table, write_corpus


def test_semijoin_matches_broadcast(ray_session):
    import ray.data as rd

    from xema_ray.stages.checks import (
        referential_violations,
        referential_violations_semijoin,
    )

    d = write_corpus("/tmp/xema_corpus_small", 100_000, n_files=8, seed=42)
    dim = rd.from_arrow(sources_dim_table())
    a = sorted((r["doc_id"] for r in referential_violations(
        rd.read_parquet(corpus_paths(d)), sources_dim_table()).take_all()), key=str)
    b = sorted((r["doc_id"] for r in referential_violations_semijoin(
        rd.read_parquet(corpus_paths(d)), dim, buckets=16).take_all()), key=str)
    assert a == b
    assert len(a) > 0
