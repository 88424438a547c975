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


class _PrefixedStream:
    """File-like over (already-read head bytes + the rest of a
    sequential NativeFile) — lets the magic sniff stay O(8 bytes)
    while the stream-format reader pulls record batches INCREMENTALLY
    instead of buffering the whole file."""

    closed = False
    mode = "rb"

    def __init__(self, head: bytes, f):
        self._head = head
        self._f = f

    def readable(self):
        return True

    def writable(self):
        return False

    def seekable(self):
        return False

    def flush(self):
        pass

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0:
                out = self._head + self._f.read()
                self._head = b""
                return out
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._f.read(n - len(out))
            return out
        return self._f.read(n)

    def close(self):
        pass


def read_ipc(paths, **kwargs):
    """Ray Dataset over Arrow IPC files — stream OR file format (one
    read task per file; record batches stream into downstream stages).

    Memory bound per read task: the STREAM format is read incrementally
    (one record batch resident at a time); the FILE format (Feather V2)
    needs footer seeks on a sequential NativeFile, so its whole file is
    buffered — size file-format inputs like parquet row groups, or
    prefer the stream format for multi-GB shards (r4 advice)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class ArrowIpcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["arrow", "ipc", "feather"]

        def _read_stream(self, f, path: str):
            # sniff the magic from the first 8 bytes only: FILE format
            # (Feather V2) needs footer seeks -> buffer it; stream
            # format reads straight through incrementally
            head = f.read(len(_FILE_MAGIC))
            if head == _FILE_MAGIC:
                buf = pa.BufferReader(head + f.read())
                reader = pa.ipc.open_file(buf)
                for i in range(reader.num_record_batches):
                    yield pa.Table.from_batches([reader.get_batch(i)])
            else:
                with pa.ipc.open_stream(_PrefixedStream(head, f)) \
                        as reader:
                    for batch in reader:
                        yield pa.Table.from_batches([batch])

    return rd.read_datasource(ArrowIpcDatasource(paths, **kwargs))
