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


def test_bloom_filter_sketch():
    import numpy as np

    from xema_ray.functions.sketches import BloomFilter, hash_strings

    members = [f"m{i}" for i in range(20_000)]
    others = [f"x{i}" for i in range(20_000)]
    bf = BloomFilter(len(members), fp_rate=0.01)
    bf.add_hashes(hash_strings(members))
    assert bf.contains_hashes(hash_strings(members)).all()  # no false negatives
    assert bf.contains_hashes(hash_strings(others)).mean() < 0.03
    a, b = BloomFilter(100), BloomFilter(100)
    a.add_hashes(hash_strings(["p"]))
    b.add_hashes(hash_strings(["q"]))
    assert a.merge(b).contains_hashes(hash_strings(["p", "q"])).all()


def test_bloom_referential_finds_all_true_violations(ray_session):
    """Filter misses are exact violations (no false negatives in the
    filter ⇒ a flagged row is truly absent from the dim)."""
    import ray.data as rd

    from xema_ray.stages.checks import (
        referential_violations,
        referential_violations_bloom,
    )

    d = write_corpus("/tmp/xema_corpus_small", 100_000, n_files=8, seed=42)
    exact = sorted((r["doc_id"] for r in referential_violations(
        rd.read_parquet(corpus_paths(d)), sources_dim_table()).take_all()), key=str)
    bloom = sorted((r["doc_id"] for r in referential_violations_bloom(
        rd.read_parquet(corpus_paths(d)), sources_dim_table()).take_all()), key=str)
    # every bloom-flagged row is a true violation; with a 5-element dim the
    # filter has essentially no false hits, so the sets match exactly
    assert set(bloom) <= set(exact)
    assert len(exact) - len(bloom) <= max(1, int(0.05 * len(exact)))
