"""Distributed exact quantiles (stages/quantiles.py) vs numpy/DuckDB.

The operator must return the exact ``quantile_disc`` order statistic for
every q — including under forced bucket refinement (tiny ``fetch_cap``),
heavy point masses (a single value holding many ranks), nulls/NaNs, and
float columns.
"""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from xema_ray.stages.quantiles import exact_quantiles

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _expected(vals, qs):
    v = np.sort(np.asarray([x for x in vals if x is not None and x == x]))
    n = len(v)
    return [v[max(math.ceil(q * n) - 1, 0)] for q in qs]


def _ds(vals, typ, blocks=7):
    import ray.data as rd

    tbl = pa.table({"x": pa.array(vals, type=typ)})
    return rd.from_arrow(tbl).repartition(blocks)


def _run(vals, typ, qs=QS, **kw):
    out = exact_quantiles(_ds(vals, typ), "x", qs, **kw)
    assert out.column_names == ["q_fp", "value"]
    assert out["q_fp"].to_pylist() == [int(math.floor(1e6 * q)) for q in qs]
    return out["value"].to_pylist()


def test_uniform_ints(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100_000, size=5_000).tolist()
    assert _run(vals, pa.int64()) == _expected(vals, QS)


def test_forced_refinement_small_fetch_cap(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1_000, size=4_000).tolist()
    got = _run(vals, pa.int64(), buckets=4, sample_per_block=4, fetch_cap=8)
    assert got == _expected(vals, QS)


def test_point_mass_dominates(ray_session):
    # 90% of mass on one value: median/quantiles land inside a bucket that
    # can never shrink below fetch_cap — the range-collapse rule must fire.
    vals = [42] * 9_000 + list(range(1_000))
    got = _run(vals, pa.int64(), buckets=8, fetch_cap=16)
    assert got == _expected(vals, QS)


def test_floats_with_nulls_and_nans(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 10, size=3_000).tolist()
    vals[::17] = [None] * len(vals[::17])
    vals[5::29] = [float("nan")] * len(vals[5::29])
    got = _run(vals, pa.float64())
    exp = _expected(vals, QS)
    assert got == pytest.approx(exp, abs=0.0)  # exact order statistics


def test_skewed_zipf(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.zipf(1.3, size=6_000).clip(0, 10**6).tolist()
    got = _run(vals, pa.int64(), buckets=16, fetch_cap=32)
    assert got == _expected(vals, QS)


def test_single_value_column(ray_session):
    got = _run([7] * 500, pa.int64(), buckets=4, fetch_cap=10)
    assert got == [7] * len(QS)


def test_empty_and_all_null(ray_session):
    out = exact_quantiles(_ds([], pa.int64(), blocks=2), "x", QS)
    assert out.num_rows == 0
    out = exact_quantiles(_ds([None] * 100, pa.float64()), "x", QS)
    assert out.num_rows == 0


def test_two_rows(ray_session):
    assert _run([10, 20], pa.int64()) == _expected([10, 20], QS)


def test_matches_duckdb_quantile_disc(ray_session):
    rng = np.random.default_rng(19)
    vals = np.concatenate([
        rng.integers(0, 50, size=2_000),       # heavy duplicates
        rng.integers(0, 10**9, size=2_000),    # sparse tail
    ]).tolist()
    got = _run(vals, pa.int64(), buckets=8, fetch_cap=64)
    con = duckdb.connect()
    for q, g in zip(QS, got):
        (d,) = con.execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?::BIGINT[]) x)",
            [q, vals],
        ).fetchone()
        assert g == d, (q, g, d)


# ---------------------------------------------------------------------------
# grouped_quantiles_counted — sparse-histogram per-group quantiles


def _grouped_expected(pairs, qs):
    import collections
    by = collections.defaultdict(list)
    for k, v in pairs:
        if v is not None:
            by[k if k is not None else "__null__"].append(v)
    rows = []
    for k in sorted(by):
        vs = sorted(by[k])
        for q in qs:
            rows.append((k, int(math.floor(1e6 * q)),
                         vs[max(math.ceil(q * len(vs)) - 1, 0)]))
    return rows


def test_grouped_quantiles_counted(ray_session):
    import ray.data as rd
    from xema_ray.stages.quantiles import grouped_quantiles_counted

    rng = np.random.default_rng(23)
    keys = rng.choice(["a", "b", "c"], size=4_000).tolist()
    vals = rng.integers(0, 200, size=4_000).tolist()
    keys += [None] * 50 + ["onlynull"]
    vals += rng.integers(0, 200, size=50).tolist() + [None]
    tbl = pa.table({"k": pa.array(keys, type=pa.string()),
                    "v": pa.array(vals, type=pa.int64())})
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    out = grouped_quantiles_counted(
        rd.from_arrow(tbl).repartition(9), "k", "v", qs)
    got = list(zip(out["k"].to_pylist(), out["q_fp"].to_pylist(),
                   out["value"].to_pylist()))
    assert got == _grouped_expected(zip(keys, vals), qs)


def test_grouped_quantiles_matches_duckdb(ray_session):
    import ray.data as rd
    from xema_ray.stages.quantiles import grouped_quantiles_counted

    rng = np.random.default_rng(31)
    keys = rng.choice(["x", "y"], size=2_000).tolist()
    vals = rng.zipf(1.5, size=2_000).clip(1, 10_000).tolist()
    tbl = pa.table({"k": keys, "v": pa.array(vals, type=pa.int64())})
    out = grouped_quantiles_counted(
        rd.from_arrow(tbl).repartition(5), "k", "v", [0.5, 0.99])
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    exp = con.execute(
        """SELECT k, 500000 q, quantile_disc(v, 0.5) val FROM t GROUP BY k
           UNION ALL
           SELECT k, 990000, quantile_disc(v, 0.99) FROM t GROUP BY k
           ORDER BY k, q"""
    ).fetchall()
    got = sorted(zip(out["k"].to_pylist(), out["q_fp"].to_pylist(),
                     out["value"].to_pylist()))
    assert got == [tuple(r) for r in exp]
