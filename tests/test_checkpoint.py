"""Checkpoint/resume semantics (FIXTURES.md F5): a run killed after k
partitions must, on resume, process only the remaining partitions and
produce identical global verdicts to an uninterrupted run."""

import json
import os
import shutil

import pytest

from xema_ray.sources.corpus import corpus_paths, write_corpus

CORPUS = "/tmp/xema_ckpt_corpus"


@pytest.fixture(scope="module")
def corpus(ray_session):
    return write_corpus(CORPUS, 8000, n_files=8, seed=42)


def test_run_and_resume(corpus, tmp_path):
    from xema_ray.state.checkpoint import load_manifest, run_validation

    paths = corpus_paths(corpus)
    out_full = str(tmp_path / "full")
    full = run_validation(paths, out_full)
    assert full.partitions_done == 8
    assert full.rows == 8000
    assert full.violations > 0

    # simulate a killed run: copy only the first 3 manifest entries
    out_resume = str(tmp_path / "resumed")
    os.makedirs(out_resume + "/violations", exist_ok=True)
    entries = [json.loads(l) for l in open(full.manifest_path)][:3]
    with open(out_resume + "/manifest.jsonl", "w") as f:
        for e in entries:
            dst = os.path.join(out_resume, "violations", e["partition"])
            shutil.copy(e["out_file"], dst)
            e = dict(e, out_file=dst)
            f.write(json.dumps(e) + "\n")

    resumed = run_validation(paths, out_resume)
    assert resumed.partitions_skipped == 3
    assert resumed.partitions_done == 5
    # identical global verdict
    assert resumed.rows == full.rows
    assert resumed.valid_rows == full.valid_rows
    assert resumed.violations == full.violations
    assert resumed.keyword_counts == full.keyword_counts

    # violation outputs byte-identical per partition
    import pyarrow.parquet as pq

    for e in load_manifest(out_resume).values():
        a = pq.read_table(e["out_file"])
        b = pq.read_table(os.path.join(out_full, "violations", e["partition"]))
        assert a.equals(b)


def test_fused_checks_and_clean_output(corpus, tmp_path):
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import run_validation

    paths = corpus_paths(corpus)
    out = str(tmp_path / "fused")
    clean = str(tmp_path / "clean")
    s = run_validation(paths, out, with_checks=True, clean_dir=clean)
    # fused report agrees with the validation verdict universe
    assert s.report["column_stats"]["n_tok"]["count"] == s.rows
    assert s.report["referential_violations"] >= 0
    assert isinstance(s.duplicate_ids, dict)
    # clean shards hold exactly the valid rows
    n_clean = sum(pq.read_metadata(os.path.join(clean, e)).num_rows
                  for e in sorted(os.listdir(clean)) if e.endswith(".parquet"))
    assert n_clean == s.valid_rows
    # resume skips with clean_dir requirement honored
    s2 = run_validation(paths, out, with_checks=True, clean_dir=clean)
    assert s2.partitions_done == 0 and s2.partitions_skipped == 8
    assert s2.duplicate_ids == s.duplicate_ids


def test_checkpoint_path_matches_dataset_path(corpus, tmp_path):
    """The per-shard checkpoint runner and the Dataset actor-pool stage
    must produce identical verdicts and per-keyword violation counts."""
    import collections

    from xema_ray.pipelines.flagship import validate_corpus
    from xema_ray.state.checkpoint import run_validation

    paths = corpus_paths(corpus)
    ck = run_validation(paths, str(tmp_path / "ck"))

    res = validate_corpus(paths, concurrency=2)
    verdict = res.verdict()
    assert verdict["rows"] == ck.rows
    assert verdict["valid_rows"] == ck.valid_rows
    assert verdict["violations"] == ck.violations
    kw = collections.Counter(
        v["keyword"] for v in res.violations().take_all())
    assert dict(kw) == ck.keyword_counts


def test_rerun_skips_everything(corpus, tmp_path):
    from xema_ray.state.checkpoint import run_validation

    paths = corpus_paths(corpus)
    out = str(tmp_path / "run")
    first = run_validation(paths, out)
    second = run_validation(paths, out)
    assert second.partitions_done == 0
    assert second.partitions_skipped == 8
    assert second.rows == first.rows


def test_summary_ignores_stale_manifest_entries(corpus, tmp_path):
    """ADVICE r1: reusing an out_dir after inputs were removed must not
    count the stale partitions in the summary."""
    from xema_ray.state.checkpoint import run_validation

    paths = corpus_paths(corpus)
    out = str(tmp_path / "reused")
    full = run_validation(paths, out)
    # rerun against only the first 3 shards: 5 stale entries remain in the
    # manifest but must not inflate the totals
    sub = run_validation(paths[:3], out)
    assert sub.partitions_skipped == 3 and sub.partitions_done == 0
    assert sub.rows == 3000
    assert sub.rows < full.rows
    assert sub.violations <= full.violations


def test_empty_shard_clean_dir(tmp_path):
    """ADVICE r1: a zero-row input shard with clean_dir set must publish an
    empty clean file instead of crashing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import run_validation

    src = tmp_path / "src"
    src.mkdir()
    empty = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_tok": pa.array([], type=pa.int64()),
        "tokens": pa.array([], type=pa.list_(pa.int32())),
    })
    p = str(src / "empty.parquet")
    pq.write_table(empty, p)
    clean = str(tmp_path / "clean")
    s = run_validation([p], str(tmp_path / "out"), clean_dir=clean)
    assert s.rows == 0 and s.partitions_done == 1
    got = pq.read_table(f"{clean}/empty.parquet")
    assert got.num_rows == 0 and got.schema.names == empty.schema.names


def test_lineage_nanosecond_precision(tmp_path):
    """ADVICE r1: lineage must distinguish same-size rewrites within one
    second (st_mtime_ns, not whole seconds)."""
    import os

    from xema_ray.state.checkpoint import _lineage

    p = tmp_path / "f.bin"
    p.write_bytes(b"x" * 100)
    l1 = _lineage(str(p))
    os.utime(p, ns=(1_000_000_001, 1_000_000_001))
    l2 = _lineage(str(p))
    os.utime(p, ns=(1_000_000_001, 1_000_000_002))  # +1ns, same size
    assert _lineage(str(p)) != l2 != l1


def test_colliding_basenames_get_unique_partitions(tmp_path, ray_session):
    """code-review r2: two inputs named part-0.parquet in different dirs
    must not overwrite each other's outputs or manifest entries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import load_manifest, run_validation

    for d, ids in (("a", ["x1", "x2"]), ("b", ["y1", "y2", "y3"])):
        (tmp_path / d).mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, type=pa.string()),
            "source": pa.array(["web"] * len(ids)),
            "n_tok": pa.array([1] * len(ids), type=pa.int64()),
            "tokens": pa.array([[1]] * len(ids), type=pa.list_(pa.int32())),
        }), str(tmp_path / d / "part-0.parquet"))
    paths = [str(tmp_path / "a" / "part-0.parquet"),
             str(tmp_path / "b" / "part-0.parquet")]
    out = str(tmp_path / "out")
    s = run_validation(paths, out)
    assert s.rows == 5 and s.partitions_done == 2
    assert len(load_manifest(out)) == 2
    # resume skips both
    s2 = run_validation(paths, out)
    assert s2.partitions_skipped == 2 and s2.rows == 5


def test_run_exact_dedup_kill_and_resume(ray_session, tmp_path):
    """r3 (VERDICT item 9): the manifest/resume layer covers the dedup
    pipeline — a run killed mid-way resumes to byte-identical output."""
    import glob
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import run_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    texts = [f"document body {i}" for i in range(300)]
    for i in range(0, 60, 3):
        texts[i + 1] = texts[i]  # 20 planted duplicate pairs
    ids = list(range(300))
    for s in range(4):
        lo, hi = s * 75, (s + 1) * 75
        pq.write_table(
            pa.table({"doc_id": pa.array(ids[lo:hi], type=pa.int64()),
                      "text": pa.array(texts[lo:hi])}),
            str(src / f"shard-{s}.parquet"))
    paths = sorted(glob.glob(str(src / "*.parquet")))
    out = str(tmp_path / "out")

    def treehash(d):
        h = hashlib.sha256()
        for f in sorted(glob.glob(os.path.join(d, "*"))):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    s1 = run_exact_dedup(paths, out)
    assert s1.rows == 300 and s1.survivors == 280 and s1.dup_groups == 20
    assert s1.partitions_done == 8 and s1.partitions_skipped == 0
    h1 = treehash(os.path.join(out, "clean"))

    # clean resume: everything skipped, nothing rewritten
    s2 = run_exact_dedup(paths, out)
    assert s2.partitions_done == 0 and s2.partitions_skipped == 8
    assert treehash(os.path.join(out, "clean")) == h1

    # crash simulation: one survivor partition never landed
    os.remove(os.path.join(out, "clean", "shard-2.parquet"))
    s3 = run_exact_dedup(paths, out)
    assert s3.partitions_done == 1 and s3.survivors == 280
    assert treehash(os.path.join(out, "clean")) == h1

    # input-shard rewrite invalidates BOTH phases of that shard
    t = pq.read_table(paths[1])
    pq.write_table(t, paths[1])
    s4 = run_exact_dedup(paths, out)
    assert s4.partitions_done == 2  # partial:shard-1 + clean:shard-1
    assert treehash(os.path.join(out, "clean")) == h1


def test_run_exact_dedup_incremental_against_prior(ray_session, tmp_path):
    """r3: incremental dedup — a new delivery deduped against a prior
    run's DIGESTS only (prior data never re-read): contents already in
    the prior corpus are dropped entirely; new-internal dups keep their
    first id."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import run_exact_dedup

    prior_src = tmp_path / "prior_src"
    prior_src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"]),
    }), str(prior_src / "p0.parquet"))
    prior_out = str(tmp_path / "prior_out")
    run_exact_dedup(sorted(glob.glob(str(prior_src / "*.parquet"))), prior_out)

    new_src = tmp_path / "new_src"
    new_src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
        # "alpha" already in prior (drop BOTH copies); "delta" new dup
        "text": pa.array(["alpha", "delta", "delta", "alpha"]),
    }), str(new_src / "n0.parquet"))
    out = str(tmp_path / "new_out")
    s = run_exact_dedup(sorted(glob.glob(str(new_src / "*.parquet"))), out,
                        prior_dirs=[prior_out])
    clean = pq.read_table(os.path.join(out, "clean", "n0.parquet"))
    assert clean["doc_id"].to_pylist() == [11]  # first "delta" only
    assert s.survivors == 1


def test_run_map_shards_resume_and_config_invalidation(ray_session, tmp_path):
    from functools import partial

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.stages.chunk import chunk_batch
    from xema_ray.state.checkpoint import run_map_shards

    ind = tmp_path / "in"
    ind.mkdir()
    for i in range(3):
        pq.write_table(pa.table({
            "doc_id": [f"{i}-{j}" for j in range(5)],
            "text": ["y" * (40 * j) for j in range(5)],
        }), str(ind / f"shard-{i}.parquet"))
    paths = sorted(str(p) for p in ind.glob("*.parquet"))
    out = str(tmp_path / "out")
    fn = partial(chunk_batch, size=64, stride=48)

    s1 = run_map_shards(paths, out, fn, cfg_sig="c:64:48")
    assert s1.partitions_done == 3 and s1.partitions_skipped == 0
    assert s1.rows_in == 15 and s1.rows_out > 15

    # resume: nothing changed → all skipped, totals intact
    s2 = run_map_shards(paths, out, fn, cfg_sig="c:64:48")
    assert s2.partitions_done == 0 and s2.partitions_skipped == 3
    assert s2.rows_out == s1.rows_out

    # touch one input shard → only that shard recomputes
    t = pq.read_table(paths[1])
    pq.write_table(t, paths[1])
    s3 = run_map_shards(paths, out, fn, cfg_sig="c:64:48")
    assert s3.partitions_done == 1 and s3.partitions_skipped == 2

    # config change invalidates everything
    s4 = run_map_shards(paths, out, partial(chunk_batch, size=32, stride=24),
                        cfg_sig="c:32:24")
    assert s4.partitions_done == 3 and s4.rows_out > s1.rows_out


def test_run_map_shards_empty_shard_keeps_schema(ray_session, tmp_path):
    from functools import partial

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.stages.chunk import chunk_batch
    from xema_ray.state.checkpoint import run_map_shards

    ind = tmp_path / "in"
    ind.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.string()),
                             "text": pa.array([], type=pa.string())}),
                   str(ind / "empty.parquet"))
    out = str(tmp_path / "out")
    s = run_map_shards([str(ind / "empty.parquet")], out,
                       partial(chunk_batch, size=10, stride=5),
                       cfg_sig="c")
    assert s.rows_in == 0 and s.rows_out == 0
    t = pq.read_table(str(tmp_path / "out" / "shards" / "empty.parquet"))
    assert t.num_rows == 0
    assert set(t.schema.names) == {"doc_id", "chunk_id", "chunk_text",
                                   "chunk_len"}


def _write_small_shards(d, n_files=7, rows_each=100):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    paths = []
    for i in range(n_files):
        t = pa.table({
            "doc_id": [f"d{i}-{j}" for j in range(rows_each)],
            "n": pa.array(np.arange(rows_each, dtype=np.int64) + i * 1000),
        })
        p = os.path.join(d, f"in-{i:03d}.parquet")
        _pq.write_table(t, p)
        paths.append(p)
    return paths


def test_run_compact_shards_roundtrip_and_resume(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from xema_ray.state.checkpoint import run_compact_shards

    src = tmp_path / "src"
    src.mkdir()
    paths = _write_small_shards(str(src), n_files=7, rows_each=100)
    out = str(tmp_path / "compacted")

    s1 = run_compact_shards(paths, out, target_rows=250)
    assert s1.files_in == 7 and s1.rows == 700
    assert s1.groups_done == 3 and s1.groups_skipped == 0  # 300/300/100

    outs = sorted(os.listdir(os.path.join(out, "shards")))
    assert outs == ["compact-00000.parquet", "compact-00001.parquet",
                    "compact-00002.parquet"]
    got = pa.concat_tables([_pq.read_table(os.path.join(out, "shards", f))
                            for f in outs])
    want = pa.concat_tables([_pq.read_table(p) for p in paths])
    assert sorted(got["doc_id"].to_pylist()) == \
        sorted(want["doc_id"].to_pylist())
    assert got.num_rows == 700

    # resume: nothing changed -> all groups skip
    s2 = run_compact_shards(paths, out, target_rows=250)
    assert s2.groups_done == 0 and s2.groups_skipped == 3

    # touching ONE input re-compacts only the group containing it
    os.utime(paths[6], ns=(1, 1))
    s3 = run_compact_shards(paths, out, target_rows=250)
    assert s3.groups_done == 1 and s3.groups_skipped == 2
    assert s3.rows == 700


def test_quarantine_unreadable_shard(corpus, tmp_path, ray_session):
    """r3: with quarantine=True a corrupt parquet is set aside in
    quarantine.jsonl, good shards complete, resume does not retry the
    same bad file, and a REPLACED (fixed) file is retried."""
    import pyarrow.parquet as pq

    from xema_ray.state.checkpoint import (load_quarantine,
                                           run_validation)

    src = tmp_path / "src"
    src.mkdir()
    paths = corpus_paths(corpus)[:3]
    local = []
    for p in paths:
        dst = str(src / os.path.basename(p))
        shutil.copy(p, dst)
        local.append(dst)
    bad = str(src / "seq-bad.parquet")
    with open(bad, "wb") as f:
        f.write(b"PAR1 this is not a real parquet file")
    local.append(bad)

    out = str(tmp_path / "out")
    s = run_validation(local, out, quarantine=True)
    assert s.partitions_quarantined == 1
    assert s.partitions_done == 3
    q = load_quarantine(out)
    (entry,) = q.values()
    assert entry["path"] == bad and "error" in entry
    # summary counts only the readable shards
    want_rows = sum(pq.read_metadata(p).num_rows for p in local[:3])
    assert s.rows == want_rows

    # resume: bad file NOT retried, nothing re-done
    s2 = run_validation(local, out, quarantine=True)
    assert s2.partitions_quarantined == 1
    assert s2.partitions_done == 0 and s2.partitions_skipped == 3

    # replace the bad file with a valid shard -> retried and validated
    shutil.copy(paths[0], bad)
    s3 = run_validation(local, out, quarantine=True)
    assert s3.partitions_quarantined == 0
    assert s3.partitions_done == 1
    assert s3.rows == want_rows + pq.read_metadata(paths[0]).num_rows


def test_quarantine_off_still_raises(corpus, tmp_path, ray_session):
    import ray

    from xema_ray.state.checkpoint import run_validation

    bad = str(tmp_path / "bad.parquet")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(Exception):
        run_validation([bad], str(tmp_path / "out"))


def test_run_near_dedup_kill_and_resume(ray_session, tmp_path):
    """r5 (VERDICT item 2): the neardup composition (pairs -> verify ->
    clusters -> survivors) runs under the manifest/lineage contract — a
    run killed mid-way resumes to byte-identical output, and unchanged
    inputs skip both the pair/cluster artifacts and the shard writes."""
    import glob
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xema_ray.stages.dedup import run_near_dedup

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(300)]
    ids, texts = [], []
    for g in range(40):
        words = list(rng.choice(vocab, size=40))
        for m in range(3):
            w = list(words)
            if m == 2:  # m=1 exact dup of m=0; m=2 one-word edit
                w[int(rng.integers(len(w)))] = f"e{g}{m}"
            ids.append(f"d{g:03d}_{m}")
            texts.append(" ".join(w))
    src = tmp_path / "src"
    src.mkdir()
    for s in range(4):
        lo, hi = s * 30, (s + 1) * 30
        pq.write_table(pa.table({"doc_id": ids[lo:hi],
                                 "text": texts[lo:hi],
                                 "n": pa.array(range(lo, hi),
                                               type=pa.int64())}),
                       str(src / f"shard-{s}.parquet"))
    paths = sorted(glob.glob(str(src / "*.parquet")))
    out = str(tmp_path / "out")

    def treehash():
        h = hashlib.sha256()
        for f in sorted(glob.glob(os.path.join(out, "survivors",
                                               "shards", "*"))):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    s1 = run_near_dedup(paths, out, threshold=0.8, candidates="allpairs")
    assert s1.docs == 120 and s1.clusters == 40
    assert s1.removed == 80 and s1.survivors == 40
    assert s1.partitions_done == 4 and s1.partitions_skipped == 0
    # survivors keep ALL original columns (the extra int column rides)
    shard0 = pq.read_table(os.path.join(out, "survivors", "shards",
                                        "shard-0.parquet"))
    assert set(shard0.column_names) == {"doc_id", "text", "n"}
    h1 = treehash()
    pairs_mtime = os.stat(os.path.join(out, "pairs.parquet")).st_mtime_ns

    # clean resume: artifacts loaded, every shard skipped
    s2 = run_near_dedup(paths, out, threshold=0.8, candidates="allpairs")
    assert s2.partitions_done == 0 and s2.partitions_skipped == 4
    assert s2.survivors == 40 and treehash() == h1
    assert os.stat(os.path.join(out, "pairs.parquet")).st_mtime_ns \
        == pairs_mtime  # pair/cluster phase not recomputed

    # crash simulation: one survivor shard never landed
    os.remove(os.path.join(out, "survivors", "shards", "shard-2.parquet"))
    s3 = run_near_dedup(paths, out, threshold=0.8, candidates="allpairs")
    assert s3.partitions_done == 1 and s3.survivors == 40
    assert treehash() == h1

    # input-shard rewrite invalidates the artifact signature AND that
    # shard's survivor write; output stays byte-identical
    t = pq.read_table(paths[1])
    pq.write_table(t, paths[1])
    s4 = run_near_dedup(paths, out, threshold=0.8, candidates="allpairs")
    assert s4.partitions_done == 1 and s4.partitions_skipped == 3
    assert treehash() == h1

    # config change (threshold) invalidates everything; at 0.95 only
    # the exact-dup member of each triple still drops (the one-word
    # edits fall below the cut)
    s5 = run_near_dedup(paths, out, threshold=0.95, candidates="allpairs")
    assert s5.partitions_done == 4
    assert s5.removed == 40 and s5.survivors == 80
