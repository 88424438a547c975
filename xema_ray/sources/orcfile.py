"""ORC source — the columnar format Hive/Spark-era data lakes hold
corpora in.  Same extension path as the Arrow-IPC source
(``sources/ipcfile.py``): a ``FileBasedDatasource`` subclass, one read
task per file, stripes yielded as Arrow tables.

The ORC footer needs random access; the ``NativeFile`` Ray hands
``_read_stream`` is a plain sequential stream, so the reader buffers
the file's bytes first (``pa.BufferReader`` is seekable).  Mirror
shards are written one-stripe-per-file and sized to keep that buffer
small — the same trade the parquet reader's row-group split makes.

``mirror_documents_orc`` writes a deterministic sharded ORC copy of a
parquet table for tests/oracles (idempotent via a row-count marker).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def mirror_documents_orc(parquet_path: str, out_dir: str,
                         columns=("doc_id", "text"),
                         rows_per_shard: int = 25_000) -> list:
    """Deterministic sharded ORC mirror of selected parquet columns.
    Returns the shard paths (sorted)."""
    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(parquet_path, columns=list(columns))
    marker = os.path.join(out_dir, "rows.marker")
    n_shards = max(1, -(-tbl.num_rows // rows_per_shard))
    paths = [os.path.join(out_dir, f"part-{i:04d}.orc")
             for i in range(n_shards)]
    if (os.path.exists(marker) and open(marker).read() == str(tbl.num_rows)
            and all(os.path.exists(p) for p in paths)):
        return paths
    for i, p in enumerate(paths):
        shard = tbl.slice(i * rows_per_shard, rows_per_shard)
        tmp = p + ".tmp"
        orc.write_table(shard, tmp)
        os.replace(tmp, p)
    with open(marker, "w") as f:
        f.write(str(tbl.num_rows))
    return paths


def read_orc(paths, **kwargs):
    """Ray Dataset over ORC files (one read task per file; stripes
    stream out as Arrow tables)."""
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
