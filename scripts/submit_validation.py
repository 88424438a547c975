"""Job entry point for ``ray job submit`` (north_rule run shape).

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/submit_validation.py \
        --input 's3://corpus/shards/*.parquet' --out /shared/run1 \
        --with-checks --clean-dir /shared/run1/clean

The script connects to the cluster it was submitted to (``ray.init()``
with no address picks up RAY_ADDRESS from the job runtime), runs the
checkpointed fused validation, and prints the machine-readable summary.
Resubmitting after a failure resumes from the per-partition manifest.

In this sandbox it runs against the local session:
    python scripts/submit_validation.py --input /tmp/xema_ray_corpus/sf0.1 --out /tmp/run1
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="directory or glob of parquet shards")
    p.add_argument("--out", required=True)
    p.add_argument("--with-checks", action="store_true")
    p.add_argument("--clean-dir")
    p.add_argument("--batch-rows", type=int, default=8192)
    p.add_argument("--fail", default="early")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` this attaches to the submitting cluster;
        # standalone it starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from xema_ray.state.checkpoint import run_validation

    spec = args.input
    if os.path.isdir(spec):
        paths = sorted(
            q for q in glob.glob(os.path.join(spec, "*.parquet"))
            if not os.path.basename(q).startswith("sources")
        )
    else:
        paths = sorted(glob.glob(spec))
    if not paths:
        raise SystemExit(f"no parquet shards match {spec!r}")

    s = run_validation(paths, args.out, fail=args.fail,
                       batch_rows=args.batch_rows,
                       with_checks=args.with_checks, clean_dir=args.clean_dir)
    out = {
        "rows": s.rows,
        "valid_rows": s.valid_rows,
        "violations": s.violations,
        "pass": s.passed,
        "partitions_done": s.partitions_done,
        "partitions_skipped": s.partitions_skipped,
        "keyword_counts": s.keyword_counts,
        "manifest": s.manifest_path,
    }
    if s.report is not None:
        out["column_stats"] = s.report["column_stats"]
        out["referential_violations"] = s.report["referential_violations"]
        out["duplicate_doc_ids"] = len(s.duplicate_ids or {})
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
