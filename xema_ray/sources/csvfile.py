"""CSV source — the other common pre-parquet interchange format.

Reads through Ray Data's ``read_csv`` (Arrow CSV parser per block, one
file = one task) so every pipeline stage runs unchanged on CSV input.
``mirror_documents_csv`` writes a deterministic RFC-4180 CSV copy of a
parquet table for tests/oracles (idempotent via a row-count marker,
mirroring :mod:`xema_ray.sources.jsonl`).
"""

from __future__ import annotations

import csv as _csv
import os

import pyarrow.parquet as pq


def mirror_documents_csv(parquet_path: str, out_path: str,
                         columns=("doc_id", "text")) -> str:
    """Deterministic CSV mirror of selected parquet columns (header row,
    minimal quoting, ``\\n`` line terminator — byte-stable)."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tbl = pq.read_table(parquet_path, columns=list(columns))
    marker = f"{out_path}.rows"
    if (os.path.exists(out_path) and os.path.exists(marker)
            and open(marker).read() == str(tbl.num_rows)):
        return out_path
    tmp = out_path + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = _csv.writer(f, quoting=_csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(columns)
        w.writerows(zip(*(tbl[c].to_pylist() for c in columns)))
    os.replace(tmp, out_path)
    with open(marker, "w") as f:
        f.write(str(tbl.num_rows))
    return out_path


def read_csv(paths, **kwargs):
    """Ray Dataset over CSV files (import kept local so the library
    never touches Ray at import time)."""
    import ray.data as rd

    return rd.read_csv(paths, **kwargs)
