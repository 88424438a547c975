"""Pin ANN/k-means/PQ MODEL PARAMETERS (not results) as SQL literals and
verify that DuckDB independently recomputes the full query output from
them (r4, VERDICT item 5).

The fitted model (centroids / hyperplanes / codebooks) is the only part
of these pipelines SQL cannot recompute (iterative / random-init); the
per-row work — assignment, probe selection, candidate generation, exact
or ADC distances, top-k with tie-breaks — is recomputed from scratch by
the oracle.  This upgrades the former pinned-VALUES *result* oracles to
property-certifying recomputation oracles.

Usage: python scripts/pin_models.py [sf_dir]
Writes /tmp/pinned_sql.py with the generated constants after verifying
each SQL against the live Ray pipeline output.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def flt(x: float) -> str:
    return repr(float(x))


def dlist(v) -> str:
    return "[" + ",".join(flt(x) for x in v) + "]::DOUBLE[]"


def ilist(v) -> str:
    # integer-valued DOUBLE[] — exact for |x| < 2^53, and list_dot_product
    # stays in DOUBLE
    return "[" + ",".join(str(int(x)) for x in v) + "]::DOUBLE[]"


def values_2d(mat, fmt) -> str:
    return ",".join(f"({i},{fmt(row)})" for i, row in enumerate(mat))


def values_cb(cb) -> str:
    out = []
    for j in range(cb.shape[0]):
        for c in range(cb.shape[1]):
            out.append(f"({j},{c},{ilist(cb[j][c])})")
    return ",".join(out)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from xema_ray.pipelines.queries import QUERIES, _read
    from xema_ray.stages.pq import ivf_coarse_fit, pq_fit
    from xema_ray.stages.similarity import kmeans_fit

    ds = _read(SF, "embeddings", ["vec_id", "embedding"])
    cent16 = kmeans_fit(ds, k=16, iters=3, seed=17)
    cent8 = kmeans_fit(ds, k=8, iters=3, seed=17)
    planes = np.random.default_rng(11).standard_normal((6, 64))
    cb = pq_fit(ds, m=4, k=16, iters=2, seed=17)
    coarse = ivf_coarse_fit(ds, nlist=16, iters=2, seed=29)

    sqls = {}

    sqls["emb_kmeans_clusters"] = f"""
    WITH cent(cid, cv) AS (VALUES {values_2d(cent8, dlist)}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE embedding IS NOT NULL),
    a AS (SELECT e.vec_id, c.cid,
            row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rn
          FROM e, cent c)
    SELECT CAST(cid AS INT) AS cluster, CAST(count(*) AS INT) AS n,
           CAST(sum(vec_id) AS INT) AS id_sum
    FROM a WHERE rn = 1 GROUP BY cid"""

    sqls["emb_knn_ivf"] = f"""
    WITH cent(cid, cv) AS (VALUES {values_2d(cent16, dlist)}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    asn AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(e.v, c.cv) DESC, c.cid) AS rn
        FROM e, cent c) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
    pr AS (SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid, row_number() OVER (PARTITION BY q.query_id
            ORDER BY list_dot_product(q.v, c.cv) DESC, c.cid) AS rn
        FROM q, cent c) WHERE rn <= 4),
    cand AS (SELECT q.query_id, e.vec_id, q.v AS qv, e.v AS ev
             FROM q JOIN pr ON pr.query_id = q.query_id
                    JOIN asn ON asn.cid = pr.cid
                    JOIN e ON e.vec_id = asn.vec_id)
    SELECT query_id, vec_id,
           CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(ev, qv) DESC, vec_id)
            AS BIGINT) AS rank
    FROM cand QUALIFY rank <= 10"""

    sqls["emb_knn_lsh"] = f"""
    WITH planes(b, pv) AS (VALUES {values_2d(planes, dlist)}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bk AS (SELECT e.vec_id, CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) > 0
                                    THEN 1<<p.b ELSE 0 END) AS BIGINT) AS bucket
           FROM e, planes p GROUP BY e.vec_id),
    q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
    qb AS (SELECT q.query_id, b.bucket FROM q JOIN bk b ON b.vec_id = q.query_id),
    -- the Ray path probes the UNION of every query's multiprobe set and
    -- ranks each query over that shared candidate pool
    cand AS (SELECT DISTINCT bk.vec_id
             FROM bk JOIN qb ON bit_count(xor(bk.bucket, qb.bucket)) <= 1)
    SELECT q.query_id, c.vec_id,
           CAST(row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(e.v, q.v) DESC, c.vec_id)
            AS BIGINT) AS rank
    FROM cand c JOIN e ON e.vec_id = c.vec_id, q
    QUALIFY rank <= 10"""

    q6 = ("list_transform(CAST(embedding AS DOUBLE[]), "
          "x -> floor(x*1000000.0))")
    sqls["emb_pq_cells"] = f"""
    WITH cb(j, cid, cv) AS (VALUES {values_cb(cb)}),
    e AS (SELECT vec_id, {q6} AS v
          FROM embeddings WHERE embedding IS NOT NULL),
    sub AS (SELECT vec_id, j, v[j*16+1 : j*16+16] AS sv
            FROM e, (SELECT unnest([0,1,2,3]) AS j)),
    asn AS (SELECT vec_id, j, cid FROM (
        SELECT s.vec_id, s.j, c.cid, row_number() OVER (
            PARTITION BY s.vec_id, s.j
            ORDER BY list_dot_product(c.cv, c.cv)
                     - 2*list_dot_product(s.sv, c.cv), c.cid) AS rn
        FROM sub s JOIN cb c ON c.j = s.j) WHERE rn = 1)
    SELECT CAST(c.j AS BIGINT) AS subspace, CAST(c.cid AS BIGINT) AS centroid,
           CAST(coalesce(g.cnt, 0) AS BIGINT) AS n,
           CAST(coalesce(g.ids, 0) AS BIGINT) AS id_sum
    FROM cb c LEFT JOIN (SELECT j, cid, count(*) AS cnt, sum(vec_id) AS ids
                         FROM asn GROUP BY j, cid) g
        ON g.j = c.j AND g.cid = c.cid"""

    adc_core = f"""
    e AS (SELECT vec_id, {q6} AS v
          FROM embeddings WHERE embedding IS NOT NULL),
    sub AS (SELECT vec_id, j, v[j*16+1 : j*16+16] AS sv
            FROM e, (SELECT unnest([0,1,2,3]) AS j)),
    asn AS (SELECT vec_id, j, cid FROM (
        SELECT s.vec_id, s.j, c.cid, row_number() OVER (
            PARTITION BY s.vec_id, s.j
            ORDER BY list_dot_product(c.cv, c.cv)
                     - 2*list_dot_product(s.sv, c.cv), c.cid) AS rn
        FROM sub s JOIN cb c ON c.j = s.j) WHERE rn = 1),
    qsub AS (SELECT vec_id AS query_id, j, sv FROM sub WHERE vec_id < 5),
    lut AS (SELECT qs.query_id, c.j, c.cid,
                   list_dot_product(qs.sv, qs.sv)
                   - 2*list_dot_product(qs.sv, c.cv)
                   + list_dot_product(c.cv, c.cv) AS d
            FROM qsub qs JOIN cb c ON c.j = qs.j)"""

    sqls["emb_knn_pq"] = f"""
    WITH cb(j, cid, cv) AS (VALUES {values_cb(cb)}),{adc_core}
    SELECT query_id, vec_id, adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_dist, vec_id) AS BIGINT) AS "rank"
    FROM (SELECT l.query_id, a.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
          FROM asn a JOIN lut l ON l.j = a.j AND l.cid = a.cid
          GROUP BY l.query_id, a.vec_id)
    QUALIFY "rank" <= 10"""

    sqls["emb_knn_ivfpq"] = f"""
    WITH cb(j, cid, cv) AS (VALUES {values_cb(cb)}),
    co(cid, cv) AS (VALUES {values_2d(coarse, ilist)}),{adc_core},
    cl AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(c.cv, c.cv)
                     - 2*list_dot_product(e.v, c.cv), c.cid) AS rn
        FROM e, co c) WHERE rn = 1),
    pr AS (SELECT query_id, cid FROM (
        SELECT e.vec_id AS query_id, c.cid, row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY list_dot_product(c.cv, c.cv)
                     - 2*list_dot_product(e.v, c.cv), c.cid) AS rn
        FROM e, co c WHERE e.vec_id < 5) WHERE rn <= 4)
    SELECT query_id, vec_id, adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_dist, vec_id) AS BIGINT) AS "rank"
    FROM (SELECT l.query_id, a.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
          FROM asn a JOIN lut l ON l.j = a.j AND l.cid = a.cid
          JOIN cl ON cl.vec_id = a.vec_id
          JOIN pr ON pr.query_id = l.query_id AND pr.cid = cl.cid
          GROUP BY l.query_id, a.vec_id)
    QUALIFY "rank" <= 10"""

    # ---- verify each against the live Ray pipeline ----
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    ok = True
    for name, sql in sqls.items():
        got = QUERIES[name].fn(SF)
        import pyarrow as pa

        if isinstance(got, pa.Table):
            got = got.to_pandas()
        elif not isinstance(got, pd.DataFrame):
            got = pd.concat([b.to_pandas() for b in
                             got.iter_batches(batch_format="pyarrow")],
                            ignore_index=True)
        want = con.execute(sql).df()
        g, w = norm(got), norm(want)
        match = g.shape == w.shape and bool(
            (g.astype(str).values == w.astype(str).values).all())
        print(f"{'ok  ' if match else 'FAIL'} {name}: ray={g.shape} "
              f"sql={w.shape}")
        if not match:
            ok = False
            print(" ray head:", g.head(3).to_dict("records"))
            print(" sql head:", w.head(3).to_dict("records"))

    with open("/tmp/pinned_sql.py", "w") as f:
        for name, sql in sqls.items():
            f.write(f"_SQL_{name.upper()} = {sql!r}\n\n")
    print("written /tmp/pinned_sql.py; all match:", ok)
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
