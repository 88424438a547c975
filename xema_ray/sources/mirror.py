"""Shared sharded-mirror scaffold for the non-parquet source formats
(Arrow IPC, ORC): deterministic shards from a parquet table, idempotent
via a marker that keys on the source lineage (size + st_mtime_ns, the
checkpoint convention) AND the mirror parameters — a changed
``rows_per_shard``/``columns`` or a regenerated source invalidates the
cache even at an unchanged row count.  Stale ``part-*`` shards beyond
the new count are removed before the marker is written, so directory
reads never resurrect deleted rows.  The no-op fast path answers from
parquet footer metadata only (no column read)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def mirror_sharded(parquet_path: str, out_dir: str, ext: str,
                   write_shard, columns, rows_per_shard: int) -> list:
    """Write ``part-NNNN.<ext>`` shards of the selected parquet columns
    via ``write_shard(table_slice, tmp_path)``.  Returns shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    st = os.stat(parquet_path)
    n_rows = pq.ParquetFile(parquet_path).metadata.num_rows
    key = (f"{n_rows}:{st.st_size}:{st.st_mtime_ns}:"
           f"{rows_per_shard}:{','.join(columns)}")
    marker = os.path.join(out_dir, "rows.marker")
    n_shards = max(1, -(-n_rows // rows_per_shard))
    paths = [os.path.join(out_dir, f"part-{i:04d}.{ext}")
             for i in range(n_shards)]
    if (os.path.exists(marker) and open(marker).read() == key
            and all(os.path.exists(p) for p in paths)):
        return paths
    tbl = pq.read_table(parquet_path, columns=list(columns))
    want = set(paths)
    for p in glob.glob(os.path.join(out_dir, f"part-*.{ext}")):
        if p not in want:
            os.unlink(p)
    for i, p in enumerate(paths):
        shard = tbl.slice(i * rows_per_shard, rows_per_shard)
        tmp = p + ".tmp"
        write_shard(shard, tmp)
        os.replace(tmp, p)
    with open(marker, "w") as f:
        f.write(key)
    return paths
