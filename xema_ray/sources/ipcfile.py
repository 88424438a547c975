"""Arrow IPC source — the zero-copy interchange format training corpora
move through between engines.

Ray Data ships no IPC reader, so this follows the sanctioned extension
path: a ``FileBasedDatasource`` subclass whose ``_read_stream`` yields
one Arrow table per record batch — the streaming executor schedules one
task per file and batches flow zero-copy into ``map_batches`` stages,
exactly like the built-in parquet reader.  Both IPC encodings are
handled: the stream format is read sequentially; the FILE format
(Feather V2, ``pa.ipc.new_file`` — detected by its ``ARROW1`` magic)
needs the footer, so its bytes are buffered first (Ray hands a
non-seekable ``NativeFile``).

``mirror_documents_ipc`` writes a deterministic sharded stream-format
mirror of a parquet table (idempotence + staleness semantics in
:func:`xema_ray.sources.mirror.mirror_sharded`).
"""

from __future__ import annotations

import pyarrow as pa

from xema_ray.sources.mirror import mirror_sharded

_FILE_MAGIC = b"ARROW1\x00\x00"


def mirror_documents_ipc(parquet_path: str, out_dir: str,
                         columns=("doc_id", "text"),
                         rows_per_shard: int = 25_000) -> list:
    """Deterministic sharded Arrow-IPC (stream format) mirror of
    selected parquet columns.  Returns the shard paths (sorted)."""

    def write_shard(shard: pa.Table, tmp: str) -> None:
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_stream(sink, shard.schema) as writer:
                writer.write_table(shard)

    return mirror_sharded(parquet_path, out_dir, "arrow", write_shard,
                          columns, rows_per_shard)


def read_ipc(paths, **kwargs):
    """Ray Dataset over Arrow IPC files — stream OR file format (one
    read task per file; record batches stream into downstream stages)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class ArrowIpcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["arrow", "ipc", "feather"]

        def _read_stream(self, f, path: str):
            # the NativeFile Ray hands over is sequential-only, so
            # buffer once and sniff the magic: FILE format (Feather V2)
            # needs footer seeks, stream format reads straight through
            buf = pa.BufferReader(f.read())
            if buf.size() >= len(_FILE_MAGIC) and \
                    buf.read_at(len(_FILE_MAGIC), 0) == _FILE_MAGIC:
                reader = pa.ipc.open_file(buf)
                for i in range(reader.num_record_batches):
                    yield pa.Table.from_batches([reader.get_batch(i)])
            else:
                with pa.ipc.open_stream(buf) as reader:
                    for batch in reader:
                        yield pa.Table.from_batches([batch])

    return rd.read_datasource(ArrowIpcDatasource(paths, **kwargs))
