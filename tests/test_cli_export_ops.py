"""CLI chunk/scrub/sample subcommands (in-process under the session Ray
fixture, like test_cli_stats)."""

import argparse
import json

import pyarrow as pa
import pyarrow.parquet as pq


def _docs(tmp_path, texts, sources=None):
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": [f"d{i:03d}" for i in range(len(texts))],
        "text": texts,
        "source": sources or ["s0"] * len(texts),
    }), str(d / "part.parquet"))
    return str(d)


def test_cmd_chunk_and_resume(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_chunk

    inp = _docs(tmp_path, ["x" * 250, "short"])
    out = str(tmp_path / "chunks")
    ns = argparse.Namespace(input=inp, out=out, text_col="text",
                            id_col="doc_id", size=100, stride=75,
                            num_cpus=4)
    cmd_chunk(ns)
    rep = json.loads(capsys.readouterr().out)
    assert rep["rows_out"] == 4      # 250 chars -> 3 chunks, short -> 1
    assert rep["partitions_done"] == 1 and rep["partitions_skipped"] == 0
    import ray.data as rd

    rows = rd.read_parquet(out + "/shards").take_all()
    assert {r["doc_id"] for r in rows} == {"d000", "d001"}
    assert max(r["chunk_id"] for r in rows) == 2
    # unchanged input + config resumes by skipping the shard
    cmd_chunk(ns)
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["partitions_skipped"] == 1 and rep2["partitions_done"] == 0
    assert rep2["rows_out"] == 4     # totals survive from the manifest


def test_cmd_scrub(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_scrub

    inp = _docs(tmp_path, ["mail a@b.io and 10.0.0.1", "clean"])
    out = str(tmp_path / "scrubbed")
    cmd_scrub(argparse.Namespace(input=inp, out=out, text_col="text",
                                 num_cpus=4))
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_email"] == 1 and rep["n_ip"] == 1
    assert rep["n_phone"] == 0 and rep["n_ssn"] == 0
    import ray.data as rd

    texts = {r["doc_id"]: r["scrubbed"]
             for r in rd.read_parquet(out + "/shards").take_all()}
    assert texts["d000"] == "mail <EMAIL> and <IP>"
    assert texts["d001"] == "clean"


def test_cmd_sample_uniform_and_mixture(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_sample

    texts = [f"body {i}" for i in range(300)]
    sources = ["a"] * 150 + ["b"] * 150
    inp = _docs(tmp_path, texts, sources)

    out1 = str(tmp_path / "uniform")
    cmd_sample(argparse.Namespace(
        input=inp, out=out1, rate=0.3, weights=None, budget=0,
        default_weight=0.0, strat_col="source", id_col="doc_id",
        hash_fn="md5", num_cpus=4))
    n1 = json.loads(capsys.readouterr().out)["rows"]
    assert 50 < n1 < 130                     # ~90 expected

    out2 = str(tmp_path / "mix")
    cmd_sample(argparse.Namespace(
        input=inp, out=out2, rate=0.0, weights='{"a": 1.0}', budget=60,
        default_weight=0.0, strat_col="source", id_col="doc_id",
        hash_fn="md5", num_cpus=4))
    rep = json.loads(capsys.readouterr().out)
    import ray.data as rd

    rows = rd.read_parquet(out2).take_all()
    assert all(r["source"] == "a" for r in rows)   # b has weight 0
    assert rep["rows"] == len(rows) > 0


def test_cmd_infer(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_infer

    inp = _docs(tmp_path, ["aa", "bbb", "c"])
    ns = argparse.Namespace(input=inp, validate=True, num_cpus=4)
    cmd_infer(ns)
    rep = json.loads(capsys.readouterr().out)
    assert rep["profile"]["text"]["min_length"] == 1
    assert rep["profile"]["text"]["max_length"] == 3
    assert rep["profile"]["source"]["enum"] == ["s0"]
    assert rep["self_check"]["pass"] is True
    assert rep["self_check"]["violations"] == 0


def test_cmd_linededup(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_linededup

    boiler = "one two three four five"
    inp = _docs(tmp_path, [f"alpha beta gamma delta eps {boiler}",
                           f"zeta eta theta iota kappa {boiler}",
                           "unique solo text line here"])
    out = str(tmp_path / "ld")
    ns = argparse.Namespace(input=inp, out=out, text_col="text",
                            id_col="doc_id", words_per_line=5, max_docs=1,
                            batch_rows=16384, num_cpus=4)
    cmd_linededup(ns)
    rep = json.loads(capsys.readouterr().out)
    assert rep["rows_in"] == 3 and rep["rows_out"] == 3
    assert rep["lines"] == 5 and rep["kept"] == 3 and rep["removed"] == 2
    assert rep["partitions_done"] == 1
    # unchanged input + config resumes: shard skipped, common set loaded
    cmd_linededup(ns)
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["partitions_skipped"] == 1 and rep2["partitions_done"] == 0
    assert rep2["lines"] == 5 and rep2["kept"] == 3


def test_cmd_diff(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_diff

    cur = tmp_path / "cur"
    prev = tmp_path / "prev"
    cur.mkdir(); prev.mkdir()
    pq.write_table(pa.table({"doc_id": [1, 2, 3],
                             "text": ["a", "b", "c"]}),
                   str(cur / "p.parquet"))
    pq.write_table(pa.table({"doc_id": [2, 3, 4],
                             "text": ["b", "C", "d"]}),
                   str(prev / "p.parquet"))
    out = str(tmp_path / "status")
    ns = argparse.Namespace(current=str(cur), previous=str(prev),
                            out=out, id_col="doc_id",
                            content_col="text", hash_fn="fast",
                            num_cpus=4)
    cmd_diff(ns)
    # raylet worker-count warnings may interleave on stdout — the
    # report is the last line
    rep = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"added": 1, "removed": 1, "changed": 1,
                   "unchanged": 1}
    import ray.data as rd

    rows = {r["doc_id"]: r["status"]
            for r in rd.read_parquet(out).take_all()}
    assert rows == {1: "added", 2: "unchanged", 3: "changed",
                    4: "removed"}


def test_cmd_bpe_train_and_apply(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_bpe

    inp = _docs(tmp_path, ["the low road", "the lower road",
                           "newest of the new"],
                sources=["a", "a", "b"])
    art = str(tmp_path / "merges.parquet")
    cmd_bpe(argparse.Namespace(input=inp, out=art, apply=None, merges=15,
                               text_col="text", id_col="doc_id",
                               num_cpus=4))
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["merges"] == 15 and rep["out"] == art
    from xema_ray.stages.bpe import load_merges

    merges = load_merges(art)
    assert len(merges) == 15 and merges[0][0] == 0

    cmd_bpe(argparse.Namespace(input=inp, out=None, apply=art, merges=0,
                               text_col="text", id_col="doc_id",
                               num_cpus=4))
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["merges"] == 15
    assert rep2["by_source"]["a"]["n_docs"] == 2
    assert rep2["by_source"]["b"]["n_words"] == 4


def test_cmd_neardup(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_neardup

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the rain falls softly on the quiet gray town tonight")
    near = base.replace("gray", "grey")
    inp = _docs(tmp_path, [base, base, near,
                           "completely unrelated words about other things "
                           "spread across many more tokens than needed"])
    out = str(tmp_path / "nd")
    cmd_neardup(argparse.Namespace(input=inp, out=out, threshold=0.7,
                                   text_col="text", id_col="doc_id",
                                   verify="hash", candidates="allpairs",
                                   num_cpus=4))
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs"] == 4 and rep["clusters"] == 1
    assert rep["removed"] == 2 and rep["survivors"] == 2
    import ray.data as rd

    # r5 checkpointed layout: per-shard survivors + single artifacts
    surv = {r["doc_id"] for r in
            rd.read_parquet(out + "/survivors/shards").take_all()}
    assert surv == {"d000", "d003"}  # min-id survivor + the unrelated doc
    cl = rd.read_parquet(out + "/clusters.parquet").take_all()
    assert {r["doc_id"] for r in cl} == {"d000", "d001", "d002"}
    assert all(r["cluster_id"] == "d000" for r in cl)
    # resumable: a second run skips every survivor shard
    cmd_neardup(argparse.Namespace(input=inp, out=out, threshold=0.7,
                                   text_col="text", id_col="doc_id",
                                   verify="hash", candidates="allpairs",
                                   num_cpus=4))
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["partitions_done"] == 0 and rep2["partitions_skipped"] > 0


def test_cmd_neardup_clean_corpus(ray_session, tmp_path, capsys):
    """Zero near-dups: survivors == full corpus, no null-typed is_in
    crash (code-review r4s2)."""
    from xema_ray.__main__ import cmd_neardup

    inp = _docs(tmp_path, ["totally distinct first document text here",
                           "second item shares absolutely nothing at all",
                           "third one is about completely other topics"])
    out = str(tmp_path / "nd_clean")
    cmd_neardup(argparse.Namespace(input=inp, out=out, threshold=0.8,
                                   text_col="text", id_col="doc_id",
                                   verify="hash", candidates="allpairs",
                                   num_cpus=4))
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rep["docs"], rep["pairs"], rep["clusters"]) == (3, 0, 0)
    assert (rep["removed"], rep["survivors"]) == (0, 3)
    import ray.data as rd

    surv = rd.read_parquet(out + "/survivors/shards")
    assert surv.count() == 3
