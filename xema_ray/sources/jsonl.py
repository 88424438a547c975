"""JSONL source — training corpora commonly arrive as JSON-lines before
they are parquet-ified; the engine reads them natively through Ray Data's
``read_json`` (one file = one task, schema inferred per block) so every
pipeline stage runs unchanged on JSONL input.

``mirror_documents_jsonl`` writes a deterministic JSONL copy of a parquet
table for tests/oracles (idempotent: skipped when the target exists and
matches the source row count).
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def mirror_documents_jsonl(parquet_path: str, out_path: str,
                           columns=("doc_id", "text")) -> str:
    """Deterministic JSONL mirror of selected parquet columns (sorted
    keys, one object per line, ``\\n`` escapes only — byte-stable)."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tbl = pq.read_table(parquet_path, columns=list(columns))
    marker = f"{out_path}.rows"
    if (os.path.exists(out_path) and os.path.exists(marker)
            and open(marker).read() == str(tbl.num_rows)):
        return out_path
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row, sort_keys=True, ensure_ascii=True))
            f.write("\n")
    os.replace(tmp, out_path)
    with open(marker, "w") as f:
        f.write(str(tbl.num_rows))
    return out_path


def read_jsonl(paths, **kwargs):
    """Ray Dataset over JSON-lines files (wrapper keeps the import local
    so the library never touches Ray at import time)."""
    import ray.data as rd

    return rd.read_json(paths, **kwargs)
