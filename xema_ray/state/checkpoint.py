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

import numpy as np
from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _partition_names(paths: list) -> dict:
    """path → unique partition name.  Basenames are used when unique
    (backward compatible with existing manifests); colliding basenames
    get a path-derived prefix so two inputs named part-0.parquet in
    different directories don't overwrite each other's outputs,
    manifest entries, or lineage (code-review r2)."""
    from collections import Counter

    counts = Counter(os.path.basename(p) for p in paths)
    out = {}
    for p in paths:
        base = os.path.basename(p)
        if counts[base] == 1:
            out[p] = base
        else:
            parent = os.path.basename(os.path.dirname(os.path.abspath(p)))
            out[p] = f"{parent}__{base}"
    return out


def _lineage(path: str) -> str:
    # nanosecond mtime: a shard rewritten with identical size within the
    # same second must NOT be treated as complete on resume
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _validate_shard(
    path: str,
    compiled,
    table_checks,
    fail: str,
    out_file: str,
    id_col: Optional[str],
    batch_rows: int,
    with_checks: bool = False,
    valid_sources=None,
    clean_dir: Optional[str] = None,
    partition_name: Optional[str] = None,
) -> dict:
    """Validate one Parquet shard; write violations atomically; return the
    manifest entry.  Runs as a Ray task (one per partition).

    ``with_checks=True`` fuses the corpus-report partials (column stats,
    HLL, per-source length histograms, referential counter) and the
    uniqueness hash-count blob into the SAME read — at corpus scale one
    pass over the data computes every check (SURVEY §7).  Partials are
    written to a sidecar pickle next to the violations file.
    """
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

    reporter = None
    uniq_blobs: list = []
    if with_checks:
        import numpy as np

        from xema_ray.functions.sketches import hash_strings
        from xema_ray.pipelines.report import _ReportPartials

        reporter = _ReportPartials(
            columns=[c for c in pf.schema_arrow.names],
            valid_sources=list(valid_sources or ()),
        )
        report_acc: list = []

    clean_batches: list = []
    for batch in pf.iter_batches(batch_size=batch_rows, use_threads=False):
        tbl = pa.Table.from_batches([batch])
        if plan is None:
            plan = compile_table_plan(compiled, tbl.schema, table_checks=table_checks)
        valid, viols = evaluate_batch(plan, tbl, fail=fail)
        if clean_dir is not None:
            clean_batches.append(tbl.filter(pa.array(valid)))
        rows += tbl.num_rows
        valid_rows += int(valid.sum())
        for cv in viols:
            kw_counts[cv.keyword] = kw_counts.get(cv.keyword, 0) + len(cv.row_idx)
        vt = violations_to_table(viols, tbl, id_col=id_col)
        if vt.num_rows:
            viol_tables.append(vt)
        if reporter is not None:
            report_acc.append(reporter.partial(tbl))
            if id_col and id_col in tbl.column_names:
                ids = tbl[id_col].combine_chunks().drop_null()
                if len(ids):
                    h = hash_strings(ids.to_pylist())
                    uniq, cnt = np.unique(h, return_counts=True)
                    uniq_blobs.append(
                        np.concatenate([uniq.view(np.int64), cnt]).tobytes()
                    )

    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    if viol_tables:
        pq.write_table(pa.concat_tables(viol_tables), tmp)
    else:
        # the empty file must carry the SAME schema a non-empty shard
        # would (id column type follows the input), or the violations dir
        # becomes a mixed-schema dataset (code-review r2)
        try:
            empty = violations_to_table(
                [], pf.schema_arrow.empty_table(), id_col=id_col)
        except Exception:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "path": pa.array([], type=pa.string()),
                "keyword": pa.array([], type=pa.string()),
                "message": pa.array([], type=pa.string()),
                "row_index": pa.array([], type=pa.int64()),
            })
        pq.write_table(empty, tmp)
    os.replace(tmp, out_file)  # atomic publish

    clean_file = None
    if clean_dir is not None:
        os.makedirs(clean_dir, exist_ok=True)
        clean_file = os.path.join(clean_dir, partition_name or os.path.basename(path))
        tmp_c = clean_file + ".tmp"
        # a zero-batch (empty) input shard still publishes an empty clean
        # file with the input schema
        pq.write_table(
            pa.concat_tables(clean_batches) if clean_batches
            else pf.schema_arrow.empty_table(),
            tmp_c,
        )
        os.replace(tmp_c, clean_file)

    partial_file = None
    if with_checks:
        import pickle as _pickle

        partial_file = out_file + ".partial.pkl"
        tmp_p = partial_file + ".tmp"
        with open(tmp_p, "wb") as f:
            _pickle.dump({"report": report_acc, "uniq_blobs": uniq_blobs}, f)
        os.replace(tmp_p, partial_file)

    n_viol = sum(kw_counts.values())
    return {
        "partial_file": partial_file,
        "clean_file": clean_file,
        "partition": partition_name or os.path.basename(path),
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
    report: Optional[dict] = None  # fused corpus report (with_checks=True)
    duplicate_ids: Optional[dict] = None  # doc_id -> n_occurrences
    partitions_quarantined: int = 0  # unreadable shards set aside
    quarantine_path: Optional[str] = None

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


def load_quarantine(out_dir: str) -> dict:
    """partition name → latest quarantine entry (unreadable shards)."""
    qpath = os.path.join(out_dir, "quarantine.jsonl")
    bad: dict = {}
    if os.path.exists(qpath):
        with open(qpath) as f:
            for line in f:
                line = line.strip()
                if line:
                    e = json.loads(line)
                    bad[e["partition"]] = e
    return bad


def run_validation(
    paths: list,
    out_dir: str,
    compiled=None,
    table_checks=None,
    fail: str = "all",
    id_col: str = "doc_id",
    batch_rows: int = 16384,
    with_checks: bool = False,
    valid_sources=None,
    clean_dir: Optional[str] = None,
    quarantine: bool = False,
) -> RunSummary:
    """Checkpointed corpus validation: one task per shard, skip completed
    partitions on resume, append manifest entries as tasks finish.

    Defaults to the flagship sequences schema (pipelines/flagship.py).
    ``with_checks=True`` fuses column stats / HLL / drift histograms /
    referential counts / uniqueness partials into the same single read
    (sidecar pickles per partition; merged here) and resolves duplicate
    ids with one thin second pass.

    ``quarantine=True``: a shard whose parquet is UNREADABLE
    (``pa.ArrowInvalid`` / ``OSError`` — corrupt footer, truncated file,
    bad magic) is set aside in ``quarantine.jsonl`` (path + error +
    lineage) instead of failing the whole run — at 100 TB one bad blob
    must not abort the job.  On resume a quarantined shard is retried
    only if its lineage changed (the file was replaced); quarantine is
    keyed on read failures only, so schema violations still flow into
    the normal violation outputs.
    """
    import ray

    if compiled is None:
        from xema_ray.pipelines.flagship import n_tok_invariant, sequences_schema

        compiled = sequences_schema()
        table_checks = [n_tok_invariant()] if table_checks is None else table_checks
    if with_checks and valid_sources is None:
        from xema_ray.sources.corpus import SOURCES

        valid_sources = list(SOURCES)

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_manifest(out_dir)

    quarantine_path = os.path.join(out_dir, "quarantine.jsonl")
    quarantined = load_quarantine(out_dir) if quarantine else {}

    part_names = _partition_names(paths)
    pending = []
    skipped = 0
    quarantined_names: set = set()
    for p in paths:
        name = part_names[p]
        q = quarantined.get(name)
        if q is not None and q["lineage"] == _lineage(p):
            quarantined_names.add(name)  # same bad file — don't retry
            continue
        e = done.get(name)
        complete = (
            e is not None
            and e["lineage"] == _lineage(p)
            and os.path.exists(e["out_file"])
            and (not with_checks or (e.get("partial_file")
                                     and os.path.exists(e["partial_file"])))
            and (clean_dir is None or (e.get("clean_file")
                                       and os.path.exists(e["clean_file"])))
        )
        if complete:
            skipped += 1
        else:
            pending.append(p)

    def _guarded_shard(path, *args):
        # quarantine mode: a read-shaped failure becomes a data item,
        # not a job failure (validation itself still raises normally)
        try:
            return _validate_shard(path, *args)
        except (pa.ArrowInvalid, OSError) as e:
            return {"__quarantine__": True,
                    "partition": args[-1],
                    "path": path,
                    "lineage": _lineage(path),
                    "error": f"{type(e).__name__}: {e}"}

    task = ray.remote(_guarded_shard if quarantine else _validate_shard)
    refs = []
    for p in pending:
        out_file = os.path.join(out_dir, "violations", part_names[p])
        refs.append(task.remote(p, compiled, table_checks, fail, out_file,
                                id_col, batch_rows, with_checks, valid_sources,
                                clean_dir, part_names[p]))

    new_entries = []
    with open(manifest_path, "a") as mf, open(quarantine_path, "a") as qf:
        remaining = list(refs)
        while remaining:
            ready, remaining = ray.wait(remaining, num_returns=min(8, len(remaining)))
            for entry in ray.get(ready):
                if entry.get("__quarantine__"):
                    entry.pop("__quarantine__")
                    qf.write(json.dumps(entry) + "\n")
                    qf.flush()
                    quarantined_names.add(entry["partition"])
                    continue
                mf.write(json.dumps(entry) + "\n")
                new_entries.append(entry)
            mf.flush()
    if not quarantine and os.path.exists(quarantine_path) \
            and os.path.getsize(quarantine_path) == 0:
        os.unlink(quarantine_path)

    # aggregate ONLY the partitions of THIS run — a reused out_dir may hold
    # manifest entries for inputs that were removed/renamed since; counting
    # those would inflate the summary and could flip the global verdict
    wanted = set(part_names.values()) - quarantined_names
    done = {k: e for k, e in load_manifest(out_dir).items() if k in wanted}
    ok_paths = [p for p in paths
                if part_names[p] not in quarantined_names]
    n_quarantined = len(quarantined_names)
    rows = sum(e["rows"] for e in done.values())
    valid_rows = sum(e["valid_rows"] for e in done.values())
    violations = sum(e["violations"] for e in done.values())
    kw: dict = {}
    for e in done.values():
        for k, v in e.get("keyword_counts", {}).items():
            kw[k] = kw.get(k, 0) + v

    report = None
    duplicate_ids = None
    if with_checks:
        report, duplicate_ids = _merge_check_partials(done, ok_paths, id_col)

    return RunSummary(
        rows=rows,
        valid_rows=valid_rows,
        violations=violations,
        partitions_done=len(new_entries),
        partitions_skipped=skipped,
        keyword_counts=kw,
        manifest_path=manifest_path,
        report=report,
        duplicate_ids=duplicate_ids,
        partitions_quarantined=n_quarantined,
        quarantine_path=quarantine_path if quarantine else None,
    )


def _merge_check_partials(done: dict, paths: list, id_col: str):
    """Merge per-partition report/uniqueness partials; resolve dup hashes
    back to id strings with one column-pruned pass."""
    import pickle

    import numpy as np
    import ray

    from xema_ray.pipelines import report as report_mod
    from xema_ray.stages.checks import _merge_blobs

    all_partials = []
    uniq_blobs = []
    for e in done.values():
        pf = e.get("partial_file")
        if not pf or not os.path.exists(pf):
            continue
        with open(pf, "rb") as f:
            side = pickle.load(f)
        all_partials.extend(side["report"])
        uniq_blobs.extend(side["uniq_blobs"])

    report = report_mod._merge_report_partials(all_partials)

    dup_h, _ = _merge_blobs(uniq_blobs)
    duplicate_ids: dict = {}
    if len(dup_h):
        dup_sorted = np.sort(dup_h)

        @ray.remote
        def resolve(path, dup_sorted, id_col):
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            from xema_ray.functions.sketches import hash_strings

            ids = pq.read_table(path, columns=[id_col])[id_col].combine_chunks().drop_null()
            if len(ids) == 0:
                return {}
            h = hash_strings(ids.to_pylist()).view(np.int64)
            pos = np.searchsorted(dup_sorted, h)
            pos = np.clip(pos, 0, len(dup_sorted) - 1)
            hit = dup_sorted[pos] == h
            out: dict = {}
            for i in np.nonzero(hit)[0]:
                k = ids[int(i)].as_py()
                out[k] = out.get(k, 0) + 1
            return out

        parts = ray.get([resolve.remote(p, dup_sorted, id_col) for p in paths])
        for part in parts:
            for k, v in part.items():
                duplicate_ids[k] = duplicate_ids.get(k, 0) + v
        duplicate_ids = {k: v for k, v in duplicate_ids.items() if v > 1}
    return report, duplicate_ids


# ----------------------------------------------------------------------
# checkpointed exact dedup (r3, VERDICT item 9): the manifest/resume layer
# for a NON-validation pipeline — per-shard digest partials, one global
# digest-only reduce, per-shard survivor filter; every per-shard phase is
# resumable and the output is byte-identical across kill/resume
# ----------------------------------------------------------------------


@dataclass
class DedupSummary:
    rows: int
    survivors: int
    dup_groups: int
    partitions_done: int
    partitions_skipped: int
    manifest_path: str
    clean_dir: str


def _dedup_digest_shard(path: str, col: str, id_col: str, hash_fn: str,
                        out_file: str, partition_name: str,
                        batch_rows: int) -> dict:
    """Phase A task: per-shard (hash, min_id, cnt) digest partial."""
    from xema_ray.stages.dedup import _content_hash_batch

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    try:
        source = pa.memory_map(path)
    except OSError:
        source = path
    pf = pq.ParquetFile(source)
    parts = []
    rows = 0
    for batch in pf.iter_batches(batch_size=batch_rows, use_threads=False,
                                 columns=[col, id_col]):
        tbl = pa.Table.from_batches([batch])
        rows += tbl.num_rows
        parts.append(_content_hash_batch(tbl, col, id_col, hash_fn))
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    merged = pa.concat_tables(parts) if parts else pa.table({
        "h": pa.array([], type=pa.string()),
        # id type from the SHARD schema: a hardcoded int64 here would
        # schema-conflict with string-id partials (code-review r3)
        "min_id": pa.array([], type=pf.schema_arrow.field(id_col).type),
        "cnt": pa.array([], type=pa.int64())})
    # re-reduce shard-locally so the partial is one row per distinct
    # hash (vectorized group sort — the pandas object groupby it
    # replaces was O(PyObject compare) per group)
    from xema_ray.stages.dedup import _groups_from_frame

    df = merged.to_pandas()
    if len(df):
        g = _groups_from_frame(df).rename(
            columns={"keep_id": "min_id", "n": "cnt"})
        out_tbl = pa.Table.from_pandas(g, preserve_index=False)
    else:
        out_tbl = merged  # keeps the typed empty schema
    pq.write_table(out_tbl, tmp)
    os.replace(tmp, out_file)
    return {"partition": f"partial:{partition_name}",
            "lineage": f"{_lineage(path)}|cfg:{col},{id_col},{hash_fn}",
            "out_file": out_file, "rows": rows}


def _dedup_filter_shard(path: str, col: str, id_col: str, hash_fn: str,
                        dup_h, keep_id, out_file: str, partition_name: str,
                        dup_sig: str, batch_rows: int) -> dict:
    """Phase C task: keep first-id-per-content rows of one shard."""
    import pyarrow.compute as pc

    from xema_ray.stages.dedup import _hash_text_column

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    try:
        source = pa.memory_map(path)
    except OSError:
        source = path
    pf = pq.ParquetFile(source)
    kept = []
    survivors = 0
    for batch in pf.iter_batches(batch_size=batch_rows, use_threads=False):
        tbl = pa.Table.from_batches([batch])
        h = _hash_text_column(tbl, col, hash_fn)
        idx = pc.index_in(h, value_set=dup_h)
        keeper = pc.take(keep_id, idx) if len(keep_id) else None
        keep = pc.is_null(idx) if keeper is None else pc.or_kleene(
            pc.is_null(idx), pc.equal(tbl[id_col], keeper))
        keep = pc.and_(pc.fill_null(keep, False),
                       pc.and_(pc.is_valid(h), pc.is_valid(tbl[id_col])))
        out = tbl.filter(keep)
        survivors += out.num_rows
        kept.append(out)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    pq.write_table(pa.concat_tables(kept) if kept
                   else pf.schema_arrow.empty_table(), tmp)
    os.replace(tmp, out_file)
    return {"partition": f"clean:{partition_name}",
            "lineage": f"{_lineage(path)}|cfg:{col},{id_col},{hash_fn}"
                       f"|dups:{dup_sig}",
            "out_file": out_file, "rows": survivors}


def run_exact_dedup(paths: list, out_dir: str, col: str = "text",
                    id_col: str = "doc_id", hash_fn: str = "fast",
                    batch_rows: int = 16384,
                    prior_dirs: list = None) -> DedupSummary:
    """Checkpointed exact content dedup over parquet shards.

    Three phases, same manifest/lineage contract as :func:`run_validation`:

    A. per-shard digest partials (one Ray task per shard, resumable —
       completed partitions with unchanged lineage are skipped);
    B. global digest-only reduce of the partials to the duplicate-group
       table ``(hash, keeper id)`` — O(duplicate groups), recomputed each
       run (cheap) and written to ``dups.parquet`` for observability;
    C. per-shard survivor filter (resumable; lineage also pins the
       duplicate-table content hash, so adding/removing input shards
       invalidates stale clean partitions automatically).

    A run killed between any two tasks resumes to byte-identical output.

    ``prior_dirs`` = INCREMENTAL dedup (the 100 TB workflow: dedup a new
    delivery against an already-deduped corpus WITHOUT re-reading it):
    each listed directory is a previous run's ``out_dir`` whose
    ``partials/`` digests join phase B with a sentinel keeper — any new
    row whose content already exists in a prior corpus is dropped
    entirely (no keeper survives from the new batch), while dup groups
    WITHIN the new batch keep their own first id as usual.  Only prior
    DIGESTS are read — never prior data rows.
    """
    import hashlib as _hashlib

    import pyarrow.compute as pc
    import ray

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    part_names = _partition_names(paths)
    done = load_manifest(out_dir)
    skipped = 0
    new_entries = []
    # lineage pins the dedup CONFIG too: resuming with a different
    # hash_fn/col/id_col must invalidate stale digests, not silently
    # reuse them (code-review r3)
    cfg = f"|cfg:{col},{id_col},{hash_fn}"

    def run_phase(tag: str, make_ref, extra_lineage: str = ""):
        nonlocal skipped
        pending = []
        for p in paths:
            name = f"{tag}:{part_names[p]}"
            e = done.get(name)
            lineage = _lineage(p) + cfg + extra_lineage
            if (e is not None and e["lineage"] == lineage
                    and os.path.exists(e["out_file"])):
                skipped += 1
            else:
                pending.append(p)
        refs = [make_ref(p) for p in pending]
        with open(manifest_path, "a") as mf:
            remaining = list(refs)
            while remaining:
                ready, remaining = ray.wait(
                    remaining, num_returns=min(8, len(remaining)))
                for entry in ray.get(ready):
                    mf.write(json.dumps(entry) + "\n")
                    new_entries.append(entry)
                    done[entry["partition"]] = entry
                mf.flush()

    # phase A: digest partials
    digest_task = ray.remote(_dedup_digest_shard)
    run_phase("partial", lambda p: digest_task.remote(
        p, col, id_col, hash_fn,
        os.path.join(out_dir, "partials", part_names[p]),
        part_names[p], batch_rows))

    # phase B: tiny global reduce over the digest partials
    import ray.data as rd

    partial_files = [os.path.join(out_dir, "partials", part_names[p])
                     for p in paths]
    partials_ds = rd.read_parquet(partial_files)
    if prior_dirs:
        import glob as _glob

        prior_files = sorted(
            f for d in prior_dirs
            for f in _glob.glob(os.path.join(d, "partials", "*"))
            if not f.endswith(".tmp"))
        if prior_files:
            def as_prior(t: pa.Table) -> pa.Table:
                # sentinel keeper that sorts BELOW every real id ("" for
                # string ids, int64-min for integer ids — real doc ids
                # are non-empty / non-negative by contract): Min picks
                # the sentinel for any content also present in a prior
                # corpus, no new row's id equals it, so every such new
                # row is filtered.  cnt=1 keeps the dup-table broadcast
                # O(overlap + new-batch dups): prior-ONLY contents stay
                # at n=1 and never enter the broadcast.
                n_rows = t.num_rows
                idt = t["min_id"].type
                sentinel = "" if pa.types.is_string(idt) or                     pa.types.is_large_string(idt) else                     np.iinfo(np.int64).min
                return pa.table({
                    "h": t["h"],
                    "min_id": pa.array([sentinel] * n_rows, type=idt),
                    "cnt": pa.array([1] * n_rows, type=pa.int64()),
                })

            partials_ds = partials_ds.union(
                rd.read_parquet(prior_files).map_batches(
                    as_prior, batch_format="pyarrow"))

    # shard partials are already one row per distinct hash; merge them
    # via the measured-auto driver / coarse-bucket strategy (stages/
    # dedup._collect_dup_groups) — not one Ray sort group per digest
    from xema_ray.functions.sketches import hash_strings
    from xema_ray.stages.dedup import _collect_dup_groups
    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows:
            b = (hash_strings(t["h"].to_pylist()) % n_buckets) \
                .astype(np.int32)
        else:
            b = np.empty(0, dtype=np.int32)
        return t.append_column("bucket", pa.array(b, type=pa.int32()))

    dup_h, keep_id = _collect_dup_groups(
        partials_ds.map_batches(add_bucket, batch_format="pyarrow"))
    pairs = sorted(zip(dup_h.to_pylist(), keep_id.to_pylist()))
    dup_h = pa.array([p[0] for p in pairs], type=pa.string())
    keep_id = pa.array([p[1] for p in pairs], type=keep_id.type)
    dup_tbl = pa.table({"h": dup_h, "keep_id": keep_id})
    dup_sig = _hashlib.sha256(
        ("\n".join(f"{h}={k}" for h, k in pairs)).encode()
    ).hexdigest()[:16]
    tmp = os.path.join(out_dir, "dups.parquet.tmp")
    pq.write_table(dup_tbl, tmp)
    os.replace(tmp, os.path.join(out_dir, "dups.parquet"))

    # phase C: survivor filter per shard (dup table rides via object store)
    dup_ref = ray.put((dup_h, keep_id))

    def filter_ref(p):
        @ray.remote
        def _task(path, out_file, name):
            h, k = ray.get(dup_ref)
            return _dedup_filter_shard(path, col, id_col, hash_fn, h, k,
                                       out_file, name, dup_sig, batch_rows)

        return _task.remote(p, os.path.join(out_dir, "clean", part_names[p]),
                            part_names[p])

    run_phase("clean", filter_ref, extra_lineage=f"|dups:{dup_sig}")

    rows = sum(done[f"partial:{part_names[p]}"]["rows"] for p in paths)
    survivors = sum(done[f"clean:{part_names[p]}"]["rows"] for p in paths)
    return DedupSummary(
        rows=rows, survivors=survivors, dup_groups=len(dup_h),
        partitions_done=len(new_entries), partitions_skipped=skipped,
        manifest_path=manifest_path,
        clean_dir=os.path.join(out_dir, "clean"))


# ----------------------------------------------------------------------
# generic checkpointed per-shard map (chunk / scrub / any 1:1 shard stage)
# ----------------------------------------------------------------------


@dataclass
class MapSummary:
    rows_in: int
    rows_out: int
    partitions_done: int
    partitions_skipped: int
    manifest_path: str
    out_dir: str


def _map_shard(path: str, batch_fn, columns, out_file: str,
               partition_name: str, cfg_sig: str, batch_rows: int) -> dict:
    """Apply ``batch_fn(pa.Table) -> pa.Table`` to one shard, write the
    output shard atomically, return the manifest entry.  One Ray task
    per shard; same mmap/single-threaded-Arrow discipline as
    ``_validate_shard``."""
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    try:
        source = pa.memory_map(path)
    except OSError:
        source = path
    pf = pq.ParquetFile(source)
    writer = None
    rows_in = rows_out = 0
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    try:
        for batch in pf.iter_batches(batch_size=batch_rows,
                                     use_threads=False, columns=columns):
            tbl = pa.Table.from_batches([batch])
            rows_in += tbl.num_rows
            out = batch_fn(tbl)
            rows_out += out.num_rows
            if writer is None:
                writer = pq.ParquetWriter(tmp, out.schema)
            writer.write_table(out)
        if writer is None:
            # empty shard: preserve the output schema by probing with an
            # empty table of the input schema
            empty_cols = columns or pf.schema_arrow.names
            probe = pa.table({
                n: pa.array([], type=pf.schema_arrow.field(n).type)
                for n in empty_cols})
            out = batch_fn(probe)
            writer = pq.ParquetWriter(tmp, out.schema)
            writer.write_table(out)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, out_file)
    return {"partition": partition_name,
            "lineage": f"{_lineage(path)}|cfg:{cfg_sig}",
            "out_file": out_file, "rows": rows_in, "rows_out": rows_out}


def run_map_shards(paths: list, out_dir: str, batch_fn, columns=None,
                   cfg_sig: str = "", batch_rows: int = 16384) -> MapSummary:
    """Checkpointed 1-shard-in → 1-shard-out map stage: one Ray task per
    shard, atomic per-shard output under ``<out_dir>/shards/``, manifest
    entries appended as tasks finish, and resume that skips shards whose
    input lineage (size + mtime_ns) AND config signature are unchanged.
    The reusable runner behind CLI ``chunk``/``scrub`` — the task
    brief's "resumable output" requirement for every export stage, not
    just validation/dedup.

    ``batch_fn`` must be picklable (a top-level function or a bound
    stage kernel); ``cfg_sig`` should encode every parameter that
    changes the output so a config change invalidates old shards.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_manifest(out_dir)
    part_names = _partition_names(paths)

    task = ray.remote(_map_shard)
    pending, skipped = [], 0
    for p in paths:
        e = done.get(part_names[p])
        lineage = f"{_lineage(p)}|cfg:{cfg_sig}"
        if e and e["lineage"] == lineage \
                and os.path.exists(e.get("out_file", "")):
            skipped += 1
        else:
            pending.append(p)
    refs = [task.remote(p, batch_fn, columns,
                        os.path.join(out_dir, "shards", part_names[p]),
                        part_names[p], cfg_sig, batch_rows)
            for p in pending]
    new_entries = []
    with open(manifest_path, "a") as mf:
        remaining = list(refs)
        while remaining:
            ready, remaining = ray.wait(
                remaining, num_returns=min(8, len(remaining)))
            for entry in ray.get(ready):
                mf.write(json.dumps(entry) + "\n")
                new_entries.append(entry)
                done[entry["partition"]] = entry
            mf.flush()

    rows_in = sum(done[part_names[p]]["rows"] for p in paths)
    rows_out = sum(done[part_names[p]].get("rows_out", 0) for p in paths)
    return MapSummary(rows_in=rows_in, rows_out=rows_out,
                      partitions_done=len(new_entries),
                      partitions_skipped=skipped,
                      manifest_path=manifest_path, out_dir=out_dir)


# ----------------------------------------------------------------------
# small-file compaction (r3): N input shards -> M right-sized shards
# ----------------------------------------------------------------------


@dataclass
class CompactSummary:
    files_in: int
    rows: int
    groups_done: int
    groups_skipped: int
    manifest_path: str
    out_dir: str


def _compact_group(paths: list, out_file: str, group_name: str,
                   lineage: str, row_group_rows: int) -> dict:
    """Stream every input shard's row groups into ONE output shard,
    written atomically.  One Ray task per output group; inputs are
    memory-mapped and never fully materialized."""
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    writer = None
    rows = 0
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    try:
        for path in paths:
            try:
                source = pa.memory_map(path)
            except OSError:
                source = path
            pf = pq.ParquetFile(source)
            for batch in pf.iter_batches(batch_size=row_group_rows,
                                         use_threads=False):
                tbl = pa.Table.from_batches([batch])
                rows += tbl.num_rows
                if writer is None:
                    writer = pq.ParquetWriter(tmp, tbl.schema)
                writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    if writer is None:
        return {"partition": group_name, "lineage": lineage,
                "out_file": "", "rows": 0, "files": len(paths)}
    os.replace(tmp, out_file)
    return {"partition": group_name, "lineage": lineage,
            "out_file": out_file, "rows": rows, "files": len(paths)}


def run_compact_shards(paths: list, out_dir: str,
                       target_rows: int = 1_000_000,
                       row_group_rows: int = 65536) -> CompactSummary:
    """Checkpointed SMALL-FILE COMPACTION: pack N undersized shards
    (the natural debris of per-partition atomic writes, retries and
    incremental runs) into ~``target_rows``-row output shards.

    File management is a first-order cost at 100 TB — a million
    64 k-row shards make every downstream scan pay a footer read and a
    task per file.  The driver plans groups greedily from parquet
    FOOTER row counts only (no data reads), each group becomes one Ray
    task streaming its inputs' row groups into one atomic output, and
    the manifest skips groups whose input lineage (every member's
    size + mtime_ns) is unchanged on resume — an input edit re-compacts
    only the groups it touches (group boundaries are lineage-keyed, so
    a changed plan invalidates exactly the shifted groups).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_manifest(out_dir)

    groups, cur, cur_rows = [], [], 0
    for p in sorted(paths):
        n = pq.ParquetFile(p).metadata.num_rows
        cur.append(p)
        cur_rows += n
        if cur_rows >= target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
    if cur:
        groups.append(cur)

    task = ray.remote(_compact_group)
    refs, skipped, planned = [], 0, []
    for i, grp in enumerate(groups):
        name = f"compact-{i:05d}.parquet"
        lineage = ";".join(_lineage(p) for p in grp)
        e = done.get(name)
        if e and e["lineage"] == lineage \
                and os.path.exists(e.get("out_file", "")):
            skipped += 1
            continue
        planned.append(name)
        refs.append(task.remote(
            grp, os.path.join(out_dir, "shards", name), name, lineage,
            row_group_rows))

    new_entries = []
    with open(manifest_path, "a") as mf:
        remaining = list(refs)
        while remaining:
            ready, remaining = ray.wait(
                remaining, num_returns=min(8, len(remaining)))
            for entry in ray.get(ready):
                mf.write(json.dumps(entry) + "\n")
                new_entries.append(entry)
                done[entry["partition"]] = entry
            mf.flush()

    names = [f"compact-{i:05d}.parquet" for i in range(len(groups))]
    rows = sum(done[n]["rows"] for n in names if n in done)
    return CompactSummary(files_in=len(paths), rows=rows,
                          groups_done=len(new_entries),
                          groups_skipped=skipped,
                          manifest_path=manifest_path, out_dir=out_dir)
