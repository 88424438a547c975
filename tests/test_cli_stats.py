"""CLI stats subcommand, including the --quantiles flag (calls the cmd_
function in-process under the session Ray fixture; main() is avoided
because it owns ray.shutdown)."""

import argparse
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_input(tmp_path):
    vals = np.arange(1, 101)          # 1..100 → exact quantiles known
    pq.write_table(pa.table({"doc_id": [f"d{i}" for i in vals],
                             "v": vals}),
                   str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_cmd_stats_quantiles(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_stats

    args = argparse.Namespace(input=_write_input(tmp_path), num_cpus=4,
                              quantiles="v=0.25,0.5,0.99")
    cmd_stats(args)
    out = json.loads(capsys.readouterr().out)
    assert out["v"]["count"] == 100
    q = out["v"]["quantiles"]
    # quantile_disc convention: smallest value at rank ceil(q*n)
    assert q["0.25"] == 25 and q["0.5"] == 50 and q["0.99"] == 99


def test_cmd_stats_without_quantiles(ray_session, tmp_path, capsys):
    from xema_ray.__main__ import cmd_stats

    args = argparse.Namespace(input=_write_input(tmp_path), num_cpus=4,
                              quantiles=None)
    cmd_stats(args)
    out = json.loads(capsys.readouterr().out)
    assert "quantiles" not in out["v"]
    assert out["v"]["min"] == 1 and out["v"]["max"] == 100


def test_cmd_explain_runs_query_and_prints_stats(ray_session, capsys):
    from xema_ray.__main__ import cmd_explain

    args = argparse.Namespace(query="doc_token_counts", num_cpus=4,
                              sf_dir="/root/testdata/sf0.001")
    cmd_explain(args)
    out = capsys.readouterr().out
    assert "Dataset throughput" in out or "Operator" in out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["query"] == "doc_token_counts"
    assert summary["rows"] > 0 and summary["sec"] > 0


def test_cmd_explain_unknown_query_suggests(ray_session):
    import pytest

    from xema_ray.__main__ import cmd_explain

    args = argparse.Namespace(query="doc_token_countz", num_cpus=4,
                              sf_dir="/root/testdata/sf0.001")
    with pytest.raises(SystemExit) as e:
        cmd_explain(args)
    assert "doc_token_counts" in str(e.value)
