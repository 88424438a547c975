"""ORC source — the columnar format Hive/Spark-era data lakes hold
corpora in.  Same extension path as the Arrow-IPC source
(``sources/ipcfile.py``): a ``FileBasedDatasource`` subclass, one read
task per file, stripes yielded as Arrow tables.

The ORC footer needs random access; the ``NativeFile`` Ray hands
``_read_stream`` is a plain sequential stream, so the reader buffers
the file's bytes first (``pa.BufferReader`` is seekable).  Mirror
shards are written one-stripe-per-file and sized to keep that buffer
small — the same trade the parquet reader's row-group split makes.

``mirror_documents_orc`` writes a deterministic sharded ORC mirror of a
parquet table (idempotence + staleness semantics in
:func:`xema_ray.sources.mirror.mirror_sharded`).
"""

from __future__ import annotations

import pyarrow as pa

from xema_ray.sources.mirror import mirror_sharded


def mirror_documents_orc(parquet_path: str, out_dir: str,
                         columns=("doc_id", "text"),
                         rows_per_shard: int = 25_000) -> list:
    """Deterministic sharded ORC mirror of selected parquet columns.
    Returns the shard paths (sorted)."""
    import pyarrow.orc as orc

    def write_shard(shard: pa.Table, tmp: str) -> None:
        orc.write_table(shard, tmp)

    return mirror_sharded(parquet_path, out_dir, "orc", write_shard,
                          columns, rows_per_shard)


def read_orc(paths, **kwargs):
    """Ray Dataset over ORC files (one read task per file; stripes
    stream out as Arrow tables).

    Memory bound per read task: the ORC footer/stripe index needs
    random access and Ray hands a sequential NativeFile, so the whole
    file is buffered before stripe decode — size ORC inputs like
    parquet row groups (the mirrors write one stripe per shard); a
    multi-GB single ORC file costs its full size in task heap
    (r4 advice)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class OrcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def _read_stream(self, f, path: str):
            import pyarrow.orc as orc

            reader = orc.ORCFile(pa.BufferReader(f.read()))
            for i in range(reader.nstripes):
                yield pa.Table.from_batches([reader.read_stripe(i)])

    return rd.read_datasource(OrcDatasource(paths, **kwargs))
