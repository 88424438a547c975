"""Example: end-to-end sequences-corpus run — generate, validate
(checkpointed + fused checks), print the quality report.

    python examples/corpus_quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from xema_ray.sources.corpus import corpus_paths, write_corpus
from xema_ray.state.checkpoint import run_validation

corpus = write_corpus("/tmp/xema_example_corpus", 50_000, n_files=8, seed=42)
out = tempfile.mkdtemp(prefix="xema_example_out_")

summary = run_validation(corpus_paths(corpus), out, with_checks=True)

print(f"rows={summary.rows} valid={summary.valid_rows} "
      f"violations={summary.violations} pass={summary.passed}")
print("violations by keyword:", summary.keyword_counts)
print("duplicate doc_ids:", len(summary.duplicate_ids))
print("referential violations:", summary.report["referential_violations"])
for col, s in summary.report["column_stats"].items():
    print(f"  {col}: count={s['count']} nulls={s['nulls']} "
          f"distinct≈{s['distinct']} min={s['min']!r} max={s['max']!r}")
print("manifest:", summary.manifest_path, "(re-run resumes / skips)")

ray.shutdown()
