"""Round-3 additions: cross-corpus line dedup, corpus-frequency scoring,
label centroid sums, CSV source round-trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


# ----------------------------------------------------------------------
# line dedup
# ----------------------------------------------------------------------


def test_segment_batch_fixed_width_lines():
    from xema_ray.stages.linededup import _segment_batch

    texts = pd.Series(["a b c d e f", "", "x y"])
    rows, line_no, lines = _segment_batch(texts, words_per_line=4)
    assert list(rows) == [0, 0, 2]
    assert list(line_no) == [0, 1, 0]
    assert list(lines) == ["a b c d", "e f", "x y"]


def test_line_dedup_removes_cross_doc_lines(ray_session):
    from xema_ray.stages.linededup import line_dedup

    boiler = "all rights reserved legal footer"
    ds = _docs_ds({
        "doc_id": [1, 2, 3],
        "text": [f"unique alpha text here {boiler}",
                 f"different beta words now {boiler}",
                 "totally fresh gamma content stands alone"],
    })
    out = {r["doc_id"]: r for r in
           line_dedup(ds, words_per_line=5, max_docs=1).take_all()}
    # the shared 5-word boilerplate line is dropped from docs 1 and 2
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 1
    assert boiler not in out[1]["clean_text"]
    assert out[3]["n_kept"] == out[3]["n_lines"] == 2
    assert "totally fresh gamma content stands" in out[3]["clean_text"]


def test_line_dedup_within_doc_repeat_kept(ray_session):
    """A line repeated INSIDE one doc counts that doc once (count
    DISTINCT doc semantics) — it survives when no other doc has it."""
    from xema_ray.stages.linededup import line_dedup

    ds = _docs_ds({"doc_id": [1],
                   "text": "same two same two other words"})
    row = line_dedup(ds, words_per_line=2, max_docs=1).take_all()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 3


def test_line_dedup_groupby_strategy_matches_driver(ray_session):
    from xema_ray.stages.linededup import line_dedup

    rows = {"doc_id": list(range(20)),
            "text": ["common shared boiler line here unique%d word" % i
                     for i in range(20)]}
    a = sorted(line_dedup(_docs_ds(rows), words_per_line=5, max_docs=1,
                          strategy="driver").take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(line_dedup(_docs_ds(rows), words_per_line=5, max_docs=1,
                          strategy="groupby").take_all(),
               key=lambda r: r["doc_id"])
    assert a == b
    assert all(r["n_kept"] == r["n_lines"] - 1 for r in a)


# ----------------------------------------------------------------------
# word-frequency scoring
# ----------------------------------------------------------------------


def test_global_word_counts(ray_session):
    from xema_ray.stages.text import global_word_counts

    ds = _docs_ds({"doc_id": [1, 2], "text": ["a a b", "b c"]})
    words, counts = global_word_counts(ds)
    assert [w.decode() for w in words] == ["a", "b", "c"]
    assert list(counts) == [2, 2, 1]


def test_word_freq_scores(ray_session):
    from xema_ray.stages.text import word_freq_scores

    ds = _docs_ds({"doc_id": [1, 2],
                   "text": ["common common rare1", "common rare2"]})
    out = {r["doc_id"]: r
           for r in word_freq_scores(ds, rare_below=2).take_all()}
    # 'common' count 3; rare1/rare2 count 1 (<2 -> rare)
    assert out[1]["n_words"] == 3 and out[1]["sum_wc"] == 3 + 3 + 1
    assert out[1]["n_rare"] == 1
    assert out[1]["rare_m"] == int(np.floor(1e6 / 3))
    assert out[2]["sum_wc"] == 4 and out[2]["n_rare"] == 1


# ----------------------------------------------------------------------
# label centroid sums
# ----------------------------------------------------------------------


def test_label_centroid_sums(ray_session):
    import ray.data as rd

    from xema_ray.stages.stats import label_centroid_sums

    tbl = pa.table({
        "label": pa.array([0, 0, 1], type=pa.int32()),
        "embedding": pa.array([[0.5, -0.25], [0.5, 0.75], [1.0, 2.0]],
                              type=pa.list_(pa.float32())),
    })
    out = label_centroid_sums(rd.from_arrow(tbl)).to_pandas()
    out = out.set_index(["label", "dim"])
    # floor(1e6*0.5)+floor(1e6*0.5) = 1_000_000
    assert out.loc[(0, 1), "s_m"] == 1_000_000 and out.loc[(0, 1), "n"] == 2
    # floor(-250000.0) = -250000 exactly; + 750000
    assert out.loc[(0, 2), "s_m"] == 500_000
    assert out.loc[(1, 1), "s_m"] == 1_000_000 and out.loc[(1, 1), "n"] == 1


# ----------------------------------------------------------------------
# CSV source
# ----------------------------------------------------------------------


def test_csv_mirror_roundtrip(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from xema_ray.sources.csvfile import mirror_documents_csv, read_csv

    src = tmp_path / "docs.parquet"
    texts = ['plain words', 'with, comma', 'quoted "inner" text',
             "multi  space"]
    pq.write_table(pa.table({"doc_id": [1, 2, 3, 4], "text": texts}),
                   str(src))
    out = str(tmp_path / "docs.csv")
    mirror_documents_csv(str(src), out)
    got = read_csv(out).take_all()
    assert [r["text"] for r in got] == texts
    # idempotent second call (marker short-circuit)
    assert mirror_documents_csv(str(src), out) == out


def test_line_dedup_duplicate_doc_id_counts_once(ray_session):
    """Regression (code-review r3): distinct-doc counting must key on
    the doc_id VALUE (count(DISTINCT doc_id)), not the batch row — two
    rows sharing one id contribute ONE doc to a line's count."""
    from xema_ray.stages.linededup import line_dedup

    ds = _docs_ds({"doc_id": [7, 7],
                   "text": ["only here once special line words",
                            "only here once special line words"]})
    out = line_dedup(ds, words_per_line=6, max_docs=1).take_all()
    # the line appears in ONE distinct doc -> kept in both rows
    assert all(r["n_kept"] == 1 for r in out)


def test_line_dedup_duplicate_doc_id_across_batches(ray_session):
    """Differential (VERDICT r3 #3): one doc_id's rows SPLIT ACROSS
    BATCHES still count as one distinct doc.  The count pass exchanges
    (line_hash, doc_hash) k-minimum-values sets, so per-batch partials
    merge by doc identity, not by batch occurrence."""
    import ray.data as rd

    from xema_ray.stages.linededup import common_lines, line_dedup

    line = "only here once special line words"
    df1 = pd.DataFrame({"doc_id": [7], "text": [line]})
    df2 = pd.DataFrame({"doc_id": [7], "text": [line]})
    ds = rd.from_pandas([df1, df2])  # two blocks -> two batches
    assert ds.num_blocks() == 2
    # one distinct doc -> not boilerplate under max_docs=1
    for strategy in ("driver", "groupby"):
        assert len(common_lines(ds, words_per_line=6, max_docs=1,
                                strategy=strategy)) == 0
    out = line_dedup(rd.from_pandas([df1, df2]), words_per_line=6,
                     max_docs=1).take_all()
    assert all(r["n_kept"] == 1 for r in out)
    # control: TWO distinct docs split across batches still flag the line
    df3 = pd.DataFrame({"doc_id": [8], "text": [line]})
    ds2 = rd.from_pandas([df1, df3])
    for strategy in ("driver", "groupby"):
        assert len(common_lines(ds2, words_per_line=6, max_docs=1,
                                strategy=strategy)) == 1


def test_line_dedup_null_doc_ids(ray_session):
    """Regression (code-review r4): factorize marks null ids code -1,
    which WRAPPED to the batch's last real doc hash (conflating a null
    row with a real doc) and raised IndexError on an all-null batch.
    Null-id rows form one shared pseudo-doc identity."""
    import ray.data as rd

    from xema_ray.stages.linededup import common_lines

    line = "only here once special line words"
    # all-null batch: must not crash; one pseudo-doc -> not boilerplate
    ds = _docs_ds({"doc_id": [None, None], "text": [line, line]})
    assert len(common_lines(ds, words_per_line=6, max_docs=1,
                            strategy="driver")) == 0
    # a real doc + a null-id row = TWO distinct docs -> boilerplate
    df1 = pd.DataFrame({"doc_id": ["a"], "text": [line]})
    df2 = pd.DataFrame({"doc_id": [None], "text": [line]})
    ds2 = rd.from_pandas([df1, df2])
    for strategy in ("driver", "groupby"):
        assert len(common_lines(ds2, words_per_line=6, max_docs=1,
                                strategy=strategy)) == 1
    # null must NOT alias the real doc in the SAME batch either
    df3 = pd.DataFrame({"doc_id": ["a", None], "text": [line, line]})
    assert len(common_lines(rd.from_pandas([df3]), words_per_line=6,
                            max_docs=1, strategy="driver")) == 1


def test_run_line_dedup_resume_and_invalidation(ray_session, tmp_path):
    import json
    import pyarrow.parquet as pq

    from xema_ray.stages.linededup import run_line_dedup

    d = tmp_path / "in"; d.mkdir()
    boiler = "shared boiler plate line here"
    for i in range(2):
        pq.write_table(pa.table({
            "doc_id": [i * 10, i * 10 + 1],
            "text": [f"unique words {i} alpha beta {boiler}",
                     f"other text {i} gamma delta {boiler}"],
        }), str(d / f"s{i}.parquet"))
    paths = sorted(str(p) for p in d.glob("*.parquet"))
    out = str(tmp_path / "out")
    s1 = run_line_dedup(paths, out, words_per_line=5)
    assert s1.partitions_done == 2 and s1.rows_out == 4
    shards1 = {p.name: p.stat().st_mtime_ns
               for p in (tmp_path / "out" / "shards").glob("*.parquet")}
    # resume: everything skipped, outputs untouched
    s2 = run_line_dedup(paths, out, words_per_line=5)
    assert s2.partitions_skipped == 2 and s2.partitions_done == 0
    shards2 = {p.name: p.stat().st_mtime_ns
               for p in (tmp_path / "out" / "shards").glob("*.parquet")}
    assert shards1 == shards2
    # config change invalidates: shards rerun with the new signature
    s3 = run_line_dedup(paths, out, words_per_line=4)
    assert s3.partitions_done == 2
    # the boilerplate line was removed from every doc
    got = pq.read_table(out + "/shards/s0.parquet").to_pandas()
    assert (got["n_kept"] < got["n_lines"]).all()
    assert not got["clean_text"].str.contains("boiler").any()


def test_ipc_mirror_roundtrip(tmp_path, ray_session):
    """Sharded Arrow-IPC mirror + custom FileBasedDatasource roundtrip:
    values survive, nulls survive (unlike CSV), sharding splits files,
    second mirror call is an idempotent no-op."""
    import pyarrow.parquet as pq

    from xema_ray.sources.ipcfile import mirror_documents_ipc, read_ipc

    src = tmp_path / "docs.parquet"
    texts = ["plain words", None, 'quoted "inner" text', "multi  space",
             "fifth row forces a second shard"]
    pq.write_table(pa.table({"doc_id": [1, 2, 3, 4, 5], "text": texts}),
                   str(src))
    out = str(tmp_path / "ipc")
    paths = mirror_documents_ipc(str(src), out, rows_per_shard=3)
    assert len(paths) == 2
    got = sorted(read_ipc(paths).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in got] == texts  # None survives IPC
    assert mirror_documents_ipc(str(src), out, rows_per_shard=3) == paths


def test_orc_mirror_roundtrip(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from xema_ray.sources.orcfile import mirror_documents_orc, read_orc

    src = tmp_path / "docs.parquet"
    texts = ["plain words", None, "third", "fourth", "fifth"]
    pq.write_table(pa.table({"doc_id": [1, 2, 3, 4, 5], "text": texts}),
                   str(src))
    out = str(tmp_path / "orc")
    paths = mirror_documents_orc(str(src), out, rows_per_shard=3)
    assert len(paths) == 2
    got = sorted(read_orc(paths).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in got] == texts
    assert mirror_documents_orc(str(src), out, rows_per_shard=3) == paths


def test_mirror_invalidation_and_stale_shard_cleanup(tmp_path, ray_session):
    """code-review r4s2: the mirror marker keys on rows_per_shard,
    columns AND source lineage; shrinking the shard count removes stale
    part files so directory reads can't resurrect rows."""
    import os

    import pyarrow.parquet as pq

    from xema_ray.sources.ipcfile import mirror_documents_ipc, read_ipc

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(8)),
                             "text": [f"t{i}" for i in range(8)]}),
                   str(src))
    out = str(tmp_path / "ipc")
    p4 = mirror_documents_ipc(str(src), out, rows_per_shard=2)
    assert len(p4) == 4
    # same source, bigger shards: must REWRITE (not return stale part-0000
    # holding 2 rows) and remove the extra shards
    p1 = mirror_documents_ipc(str(src), out, rows_per_shard=8)
    assert len(p1) == 1
    assert read_ipc(p1).count() == 8
    assert sorted(f for f in os.listdir(out) if f.startswith("part-")) \
        == ["part-0000.arrow"]
    # regenerated source with SAME row count: marker must invalidate
    pq.write_table(pa.table({"doc_id": list(range(8)),
                             "text": [f"u{i}" for i in range(8)]}),
                   str(src))
    mirror_documents_ipc(str(src), out, rows_per_shard=8)
    texts = {r["text"] for r in read_ipc(p1).take_all()}
    assert texts == {f"u{i}" for i in range(8)}


def test_read_ipc_file_format_feather(tmp_path, ray_session):
    """The reader sniffs the ARROW1 magic: FILE-format (Feather V2)
    inputs written by pa.ipc.new_file read correctly too."""
    from xema_ray.sources.ipcfile import read_ipc

    p = str(tmp_path / "docs.feather")
    t = pa.table({"doc_id": [1, 2], "text": ["a b", None]})
    with pa.OSFile(p, "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
    got = sorted(read_ipc([p]).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in got] == ["a b", None]


def test_avro_mirror_roundtrip(tmp_path, ray_session):
    """Sharded Avro object-container mirror + pure-stdlib datasource
    roundtrip (r5): values and nulls survive (nullable union branch),
    sharding splits files, second mirror call is an idempotent no-op."""
    import pyarrow.parquet as pq

    from xema_ray.sources.avrofile import mirror_documents_avro, read_avro

    src = tmp_path / "docs.parquet"
    texts = ["plain words", None, 'quoted "inner" text', "multi  space",
             "fifth row forces a second shard"]
    pq.write_table(pa.table({"doc_id": [1, 2, 3, 4, 5], "text": texts}),
                   str(src))
    out = str(tmp_path / "avro")
    paths = mirror_documents_avro(str(src), out, rows_per_shard=3)
    assert len(paths) == 2
    got = sorted(read_avro(paths).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in got] == texts  # None survives Avro
    assert mirror_documents_avro(str(src), out, rows_per_shard=3) == paths


def test_avro_codec_roundtrip_and_corruption(tmp_path):
    """The stdlib Avro encoder/decoder: all supported primitive types,
    nullable unions, deflate + null codecs, multi-block files, and the
    corrupt-sync / truncated-varint error paths."""
    avro_path = str(tmp_path / "roundtrip.avro")
    import io

    from xema_ray.sources.avrofile import (AvroError, iter_avro_blocks,
                                           write_avro)

    t = pa.table({
        "s": pa.array(["a", "", None, "d"], type=pa.string()),
        "n": pa.array([1, -5, 2 ** 62, None], type=pa.int64()),
        "i32": pa.array([7, -1, 0, 3], type=pa.int32()),
        "d": pa.array([1.5, -2.25, 0.0, 3.75], type=pa.float64()),
        "b": pa.array([True, False, None, True], type=pa.bool_()),
        "raw": pa.array([b"\x00\xff", b"", b"abc", b"q"],
                        type=pa.binary()),
    })
    for codec in ("deflate", "null"):
        write_avro(t, avro_path, codec=codec,
                   rows_per_block=3)
        with open(avro_path, "rb") as f:
            parts = list(iter_avro_blocks(f))
        assert [p.num_rows for p in parts] == [3, 1]
        got = pa.concat_tables(parts)
        assert got.to_pydict() == t.to_pydict(), codec
    data = bytearray(open(avro_path, "rb").read())
    data[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(AvroError):
        list(iter_avro_blocks(io.BytesIO(bytes(data))))
    with pytest.raises(AvroError):  # truncated mid-block
        list(iter_avro_blocks(io.BytesIO(bytes(data[:-25]))))


def test_avro_union_branch_order_and_writer_guards(tmp_path):
    """Regression (code-review r5): a spec-legal ``[T, "null"]`` union
    (value branch FIRST) must decode by the header's branch order, not a
    hardcoded null=0 assumption; the writer must reject unknown codecs
    up front and nullability pins it cannot honor."""
    import io
    import json

    from xema_ray.sources.avrofile import (AvroError, iter_avro_blocks,
                                           write_avro)

    # build a [T,"null"] file by rewriting the schema of a ["null",T]
    # one and re-encoding the branch indices (swap 0 <-> 1)
    t = pa.table({"x": pa.array([7, None, -3], type=pa.int64())})
    p = str(tmp_path / "u.avro")
    write_avro(t, p, codec="null", rows_per_block=10)
    raw = open(p, "rb").read()
    old = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "x", "type": ["null", "long"]}]}).encode()
    new = json.dumps({"type": "record", "name": "row", "fields": [
        {"name": "x", "type": ["long", "null"]}]}).encode()
    assert old in raw and len(old) == len(new)
    body = raw.replace(old, new)
    # branch indices live as zigzag varints 0x00 (0) / 0x02 (1) at the
    # start of each row; rows are (idx[, long]) so swap them in place
    sync_at = body.rindex(bytes(range(16)))
    hdr_end = body.index(bytes(range(16))) + 16
    blk = bytearray(body[hdr_end:sync_at])
    # block header: count, size varints then rows: 02 0e | 00 | 02 05
    # (7 zigzag=0x0e, -3 zigzag=0x05); swap the three branch bytes
    assert bytes(blk[2:]) == b"\x02\x0e\x00\x02\x05"
    blk[2:] = b"\x00\x0e\x02\x00\x05"
    fixed = body[:hdr_end] + bytes(blk) + body[sync_at:]
    got = pa.concat_tables(list(iter_avro_blocks(io.BytesIO(fixed))))
    assert got["x"].to_pylist() == [7, None, -3]

    with pytest.raises(AvroError):  # unknown codec rejected up front
        write_avro(t, str(tmp_path / "bad.avro"), codec="snappy")
    assert not (tmp_path / "bad.avro").exists()
    with pytest.raises(AvroError):  # pinned non-nullable but has nulls
        write_avro(t, str(tmp_path / "bad2.avro"),
                   nullable_cols=frozenset())
    # pinned nullable on an all-non-null shard: union schema, roundtrips
    t2 = pa.table({"x": pa.array([1, 2], type=pa.int64())})
    p2 = str(tmp_path / "pin.avro")
    write_avro(t2, p2, nullable_cols=frozenset({"x"}))
    hdr = open(p2, "rb").read()
    assert b'["null", "long"]' in hdr.replace(b'", "', b'", "') or \
        b'"type": ["null", "long"]' in hdr
    with open(p2, "rb") as f:
        got2 = pa.concat_tables(list(iter_avro_blocks(f)))
    assert got2["x"].to_pylist() == [1, 2]
    # missing avro.schema metadata -> AvroError, not KeyError
    raw2 = open(p2, "rb").read()
    broken = raw2.replace(b"avro.schema", b"avro.xchema")
    with pytest.raises(AvroError):
        list(iter_avro_blocks(io.BytesIO(broken)))
