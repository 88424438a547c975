"""Checkpointed, resumable validation runs — per-partition lineage + metrics.

Ray's lineage-based retries cover tasks WITHIN a job; cross-job resume
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics") needs a durability layer, which is this module:

* one input Parquet file = one partition = one Ray task
  (``@ray.remote`` — the explicitly-justified drop below the Dataset API:
  per-partition atomic outputs + skip-list semantics aren't expressible as
  a Dataset transform),
* each task streams the file's row groups through the compiled vectorized
  plan (zero-copy Arrow; same kernels as the Dataset stage), writes its
  violation rows atomically (tmp + rename), and returns a manifest entry
  ``(partition, lineage, rows, valid_rows, violations, per-keyword counts)``,
* the manifest is an append-only JSONL; on resume, partitions whose lineage
  (size + mtime) matches are skipped, so a killed run redoes only
  unfinished partitions and global verdicts are byte-identical to an
  uninterrupted run (FIXTURES.md F5).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _lineage(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{int(st.st_mtime)}"


def _validate_shard(
    path: str,
    compiled,
    table_checks,
    fail: str,
    out_file: str,
    id_col: Optional[str],
    batch_rows: int,
) -> dict:
    """Validate one Parquet shard; write violations atomically; return the
    manifest entry.  Runs as a Ray task (one per partition)."""
    from xema_ray.functions.kernels import (
        compile_table_plan,
        evaluate_batch,
        violations_to_table,
    )

    # each task owns ONE scheduled CPU — a per-worker Arrow thread pool
    # (default = machine cores) would oversubscribe the node 32×
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)

    # memory-map instead of read(): page-cache copies through read() showed
    # severe kernel-side contention at high task concurrency (sys-time
    # blow-up); mmap maps pages zero-copy and scales with cores
    try:
        source = pa.memory_map(path)
    except OSError:
        source = path
    pf = pq.ParquetFile(source)
    plan = None
    rows = 0
    valid_rows = 0
    kw_counts: dict = {}
    viol_tables = []
    for batch in pf.iter_batches(batch_size=batch_rows, use_threads=False):
        tbl = pa.Table.from_batches([batch])
        if plan is None:
            plan = compile_table_plan(compiled, tbl.schema, table_checks=table_checks)
        valid, viols = evaluate_batch(plan, tbl, fail=fail)
        rows += tbl.num_rows
        valid_rows += int(valid.sum())
        for cv in viols:
            kw_counts[cv.keyword] = kw_counts.get(cv.keyword, 0) + len(cv.row_idx)
        vt = violations_to_table(viols, tbl, id_col=id_col)
        if vt.num_rows:
            viol_tables.append(vt)

    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    if viol_tables:
        pq.write_table(pa.concat_tables(viol_tables), tmp)
    else:
        empty = pa.table({
            "doc_id": pa.array([], type=pa.string()),
            "path": pa.array([], type=pa.string()),
            "keyword": pa.array([], type=pa.string()),
            "message": pa.array([], type=pa.string()),
            "row_index": pa.array([], type=pa.int64()),
        })
        pq.write_table(empty, tmp)
    os.replace(tmp, out_file)  # atomic publish

    n_viol = sum(kw_counts.values())
    return {
        "partition": os.path.basename(path),
        "input": path,
        "lineage": _lineage(path),
        "rows": rows,
        "valid_rows": valid_rows,
        "violations": n_viol,
        "keyword_counts": kw_counts,
        "pass": rows == valid_rows,
        "out_file": out_file,
        "completed_at": time.time(),
    }


@dataclass
class RunSummary:
    rows: int
    valid_rows: int
    violations: int
    partitions_done: int
    partitions_skipped: int
    keyword_counts: dict
    manifest_path: str

    @property
    def passed(self) -> bool:
        return self.rows == self.valid_rows


def load_manifest(out_dir: str) -> dict:
    """partition name → latest manifest entry."""
    manifest = os.path.join(out_dir, "manifest.jsonl")
    done: dict = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            for line in f:
                line = line.strip()
                if line:
                    e = json.loads(line)
                    done[e["partition"]] = e
    return done


def run_validation(
    paths: list,
    out_dir: str,
    compiled=None,
    table_checks=None,
    fail: str = "early",
    id_col: str = "doc_id",
    batch_rows: int = 16384,
    max_in_flight: Optional[int] = None,
) -> RunSummary:
    """Checkpointed corpus validation: one task per shard, skip completed
    partitions on resume, append manifest entries as tasks finish.

    Defaults to the flagship sequences schema (pipelines/flagship.py).
    """
    import ray

    if compiled is None:
        from xema_ray.pipelines.flagship import n_tok_invariant, sequences_schema

        compiled = sequences_schema()
        table_checks = [n_tok_invariant()] if table_checks is None else table_checks

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_manifest(out_dir)

    pending = []
    skipped = 0
    for p in paths:
        name = os.path.basename(p)
        e = done.get(name)
        if e is not None and e["lineage"] == _lineage(p) and os.path.exists(e["out_file"]):
            skipped += 1
            continue
        pending.append(p)

    task = ray.remote(_validate_shard)
    refs = []
    for p in pending:
        out_file = os.path.join(out_dir, "violations", os.path.basename(p))
        refs.append(task.remote(p, compiled, table_checks, fail, out_file,
                                id_col, batch_rows))

    new_entries = []
    with open(manifest_path, "a") as mf:
        remaining = list(refs)
        while remaining:
            ready, remaining = ray.wait(remaining, num_returns=1)
            entry = ray.get(ready[0])
            mf.write(json.dumps(entry) + "\n")
            mf.flush()
            new_entries.append(entry)

    done = load_manifest(out_dir)
    rows = sum(e["rows"] for e in done.values())
    valid_rows = sum(e["valid_rows"] for e in done.values())
    violations = sum(e["violations"] for e in done.values())
    kw: dict = {}
    for e in done.values():
        for k, v in e.get("keyword_counts", {}).items():
            kw[k] = kw.get(k, 0) + v
    return RunSummary(
        rows=rows,
        valid_rows=valid_rows,
        violations=violations,
        partitions_done=len(new_entries),
        partitions_skipped=skipped,
        keyword_counts=kw,
        manifest_path=manifest_path,
    )
