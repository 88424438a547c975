"""Arrow IPC (stream format, ``.arrow``) source — the zero-copy
interchange format training corpora move through between engines.

Ray Data ships no IPC reader, so this follows the sanctioned extension
path: a ``FileBasedDatasource`` subclass whose ``_read_stream`` yields
one Arrow table per record batch — the streaming executor schedules one
task per file split and batches flow zero-copy into ``map_batches``
stages, exactly like the built-in parquet reader.

``mirror_documents_ipc`` writes a deterministic sharded IPC copy of a
parquet table for tests/oracles (idempotent via a row-count marker,
like the CSV/JSONL mirrors).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def mirror_documents_ipc(parquet_path: str, out_dir: str,
                         columns=("doc_id", "text"),
                         rows_per_shard: int = 25_000) -> list:
    """Deterministic sharded Arrow-IPC mirror of selected parquet
    columns.  Returns the shard paths (sorted)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(parquet_path, columns=list(columns))
    marker = os.path.join(out_dir, "rows.marker")
    n_shards = max(1, -(-tbl.num_rows // rows_per_shard))
    paths = [os.path.join(out_dir, f"part-{i:04d}.arrow")
             for i in range(n_shards)]
    if (os.path.exists(marker) and open(marker).read() == str(tbl.num_rows)
            and all(os.path.exists(p) for p in paths)):
        return paths
    for i, p in enumerate(paths):
        shard = tbl.slice(i * rows_per_shard, rows_per_shard)
        tmp = p + ".tmp"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_stream(sink, shard.schema) as writer:
                writer.write_table(shard)
        os.replace(tmp, p)
    with open(marker, "w") as f:
        f.write(str(tbl.num_rows))
    return paths


def read_ipc(paths, **kwargs):
    """Ray Dataset over Arrow IPC files (one read task per file split;
    record batches stream straight into downstream stages)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class ArrowIpcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["arrow", "ipc", "feather"]

        def _read_stream(self, f, path: str):
            # IPC STREAM format: sequential, so it works on the
            # non-seekable NativeFile Ray hands to read tasks (the FILE
            # format's footer needs random access and raises)
            with pa.ipc.open_stream(f) as reader:
                for batch in reader:
                    yield pa.Table.from_batches([batch])

    return rd.read_datasource(ArrowIpcDatasource(paths, **kwargs))
