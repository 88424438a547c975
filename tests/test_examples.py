"""Examples must stay runnable — each runs in its own subprocess with its
own Ray session (they own ray.init; the test session must not)."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF0001 = "/root/testdata/sf0.001"


@pytest.mark.parametrize("script,needle,args", [
    ("corpus_quickstart.py", "manifest:", []),
    ("training_data_pipeline.py", "near-dup pairs:", []),
    ("validate_documents.py", None, []),
    ("export_pipeline.py", "chunks_exported", []),
    ("corpus_cleaning.py", "cleaning_done", [_SF0001]),
    ("event_analytics.py", "analytics_done", [_SF0001]),
    ("incremental_ingest.py", "ingest_done", [_SF0001]),
    ("substring_dedup.py", "dup spans:", [_SF0001]),
])
def test_example_runs(script, needle, args):
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=300, cwd=_ROOT,
        env={**os.environ, "RAY_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    if needle:
        assert needle in out.stdout, out.stdout[-2000:]
