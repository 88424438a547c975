"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare with oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python scripts/check_oracles.py [--json OUT.json] [sf_dir] [query ...]

With --json, also write a CORRECTNESS_r*.json-shaped record (one object per
query: rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so the
FULL registry sweep (every registered query) can be committed per round
alongside the driver's 50-query sample.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray Dataset
    parts = [b.to_pandas() for b in result.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict = {}

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: engine error {type(e).__name__}: {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {e}"}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} (rows-only, {dt:.1f}s)")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": None,
                            "rows_only": True}
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(got),
                            "oracle_rows": None, "err": f"oracle: {e}"}
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        status = "ok  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        record[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                        "hash_match": ok_hash, "spark_rows": len(got),
                        "oracle_rows": len(want), "err": None}
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows={len(got)}/{len(want)} schema={ok_schema} "
              f"hash={'=' if ok_hash else '!'} ({dt:.1f}s)")
        if status == "FAIL" and ok_schema and ok_rows:
            gs = got.reindex(sorted(got.columns), axis=1)
            ws = want.reindex(sorted(want.columns), axis=1)
            key = sorted(got.columns)
            gs = gs.sort_values(key).reset_index(drop=True).astype(str)
            ws = ws.sort_values(key).reset_index(drop=True).astype(str)
            diff = (gs != ws).any(axis=1)
            print("  first diffs:")
            print(pd.concat([gs[diff].head(3).add_prefix("got_"),
                             ws[diff].head(3).add_prefix("want_")], axis=1))
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {json_out} ({len(record)} queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
