"""Round-5 stress protocol (r4 VERDICT item 4): the round-4 operators at
20x the bench corpus, with per-operator wall time and DRIVER PEAK RSS.

The 20x documents corpus replicates sf0.1's 5k docs 20x with per-replica
one-word perturbations, so almost EVERY doc sits in a 20-member near-dup
group — the adversarial duplication-heavy shape that used to blow up the
driver-side verification gather (the honest test of r4 verdict item 1:
the bucketed lane is forced for the pair-verified runs).

Each operator runs in its OWN subprocess (fresh Ray session) so
``ru_maxrss`` is a per-operator driver bound, and prints one JSON line.

Usage:
    python scripts/stress_r5.py            # run everything (driver mode)
    python scripts/stress_r5.py <op>       # one op in-process
Ops: gen dup_spans span_scrub allpairs shared_passages
     minhash_bucketed lm_familiarity semantic_dedup cc_10m
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRESS_DIR = "/dev/shm/xema_stress20x"
N_REP = 20
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False)


def gen():
    """20x documents + embeddings corpora (idempotent; sharded)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(STRESS_DIR, exist_ok=True)
    marker = os.path.join(STRESS_DIR, ".done")
    if os.path.exists(marker):
        return {"op": "gen", "cached": True}
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    n = len(ids)
    for r in range(N_REP):
        if r == 0:
            rep_texts = texts
        else:
            # one appended marker word per replica: near-dup (J ~ 0.97),
            # never exact-dup — the worst shape for pair verification
            rep_texts = [f"{t or ''} zrep{r}" for t in texts]
        t = pa.table({
            "doc_id": pa.array([i + r * 1_000_000 for i in
                                range(n)], type=pa.int64()),
            "text": pa.array(rep_texts, type=pa.string()),
        })
        pq.write_table(t, os.path.join(STRESS_DIR,
                                       f"docs-{r:02d}.parquet"))
    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(7)
    for r in range(N_REP):
        noise = rng.normal(0, 0.01, vecs.shape).astype(np.float32) \
            if r else np.zeros_like(vecs)
        t = pa.table({
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)
                               + r * 1_000_000),
            "embedding": pa.array(list(vecs + noise)),
        })
        pq.write_table(t, os.path.join(STRESS_DIR,
                                       f"emb-{r:02d}.parquet"))
    open(marker, "w").write("ok")
    return {"op": "gen", "docs": n * N_REP, "vecs": len(vecs) * N_REP}


def _docs():
    import glob

    import ray.data as rd

    return rd.read_parquet(sorted(glob.glob(
        os.path.join(STRESS_DIR, "docs-*.parquet"))))


def op_dup_spans():
    from xema_ray.stages.dedup import dup_spans

    _init()
    spans = dup_spans(_docs(), n=8, min_count=2,
                      hash_fn="verified").materialize()
    return {"rows": spans.count()}


def op_span_scrub():
    from xema_ray.stages.dedup import dup_spans, remove_spans

    _init()
    manifest = dup_spans(_docs(), n=8, min_count=2, hash_fn="verified")
    out = remove_spans(_docs(), manifest).materialize()
    return {"rows": out.count()}


def op_allpairs():
    from xema_ray.stages.dedup import (allpairs_jaccard_pairs,
                                       verify_pairs_jaccard)

    _init()
    docs = _docs()
    cands = allpairs_jaccard_pairs(docs, threshold=0.5)
    verified = verify_pairs_jaccard(cands, docs, threshold=0.5,
                                    fixed_point=True, method="hash",
                                    strategy="bucketed").materialize()
    return {"pairs": verified.count()}


def op_minhash_bucketed():
    from xema_ray.stages.dedup import minhash_lsh_pairs, verify_pairs_jaccard

    _init()
    docs = _docs()
    cands = minhash_lsh_pairs(docs, threshold=0.45)
    verified = verify_pairs_jaccard(cands, docs, threshold=0.5,
                                    fixed_point=True, method="hash",
                                    strategy="bucketed").materialize()
    return {"pairs": verified.count()}


def op_shared_passages():
    """Winnowing shared-passage pairs at 20x: every base doc's 20-member
    replica group shares nearly all fingerprints, so raw pair-row
    emission is ~C(20,2) x fps-per-doc per group — far above
    auto_driver_limit, forcing the distributed pair-hash-bucket
    intersection count (the honest test of the r5 emission-count fix)."""
    from xema_ray.stages.dedup import shared_passage_pairs

    _init()
    out = shared_passage_pairs(_docs(), as_dataset=True).materialize()
    return {"pairs": out.count()}


def op_lm_familiarity():
    from xema_ray.stages.text import lm_familiarity

    _init()
    out = lm_familiarity(_docs(), ref_mod=20).materialize()
    return {"rows": out.count()}


def op_semantic_dedup():
    import glob

    import ray.data as rd

    from xema_ray.stages.similarity import semantic_dedup

    _init()
    emb = rd.read_parquet(sorted(glob.glob(
        os.path.join(STRESS_DIR, "emb-*.parquet"))))
    out = semantic_dedup(emb, k=8, iters=3, seed=17,
                         tau=0.4).materialize()
    import pyarrow.compute as pc

    dups = sum(b.filter(pc.not_equal(b["dup_of"], -1)).num_rows
               if "dup_of" in b.column_names else 0
               for b in out.iter_batches(batch_format="pyarrow"))
    return {"rows": out.count(), "dups": dups}


def op_cc_10m():
    """10M-node differential: bucketed label table vs driver lane
    (r4 VERDICT item 8 'done' criterion)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.cluster import connected_components

    _init()
    n = 10_000_000
    rng = np.random.default_rng(3)
    # 5M chain edges (2-node components) + 2M random extra edges
    a = np.arange(0, n, 2, dtype=np.int64)
    extra_u = rng.integers(0, n, 2_000_000).astype(np.int64)
    extra_v = rng.integers(0, n, 2_000_000).astype(np.int64)
    u = np.concatenate([a, extra_u])
    v = np.concatenate([a + 1, extra_v])
    keep = u != v
    tbl = pa.table({"doc_a": u[keep], "doc_b": v[keep]})
    ds = rd.from_arrow(tbl).repartition(64).materialize()
    t0 = time.time()
    drv = connected_components(ds, labels="driver").materialize()
    t_drv = time.time() - t0
    t0 = time.time()
    bkt = connected_components(ds, labels="bucketed").materialize()
    t_bkt = time.time() - t0

    def tohash(d):
        import hashlib

        h = hashlib.sha256()
        rows = []
        for b in d.iter_batches(batch_format="pyarrow"):
            node = b["node"].to_numpy(zero_copy_only=False)
            lbl = b["lbl"].to_numpy(zero_copy_only=False)
            rows.append(np.stack([node, lbl]))
        m = np.concatenate(rows, axis=1)
        order = np.argsort(m[0])
        h.update(m[:, order].tobytes())
        return h.hexdigest()[:16], m.shape[1]

    h1, n1 = tohash(drv)
    h2, n2 = tohash(bkt)
    return {"nodes": n1, "equal": h1 == h2 and n1 == n2,
            "sec_driver": round(t_drv, 1), "sec_bucketed": round(t_bkt, 1)}


OPS = {
    "gen": gen,
    "dup_spans": op_dup_spans,
    "span_scrub": op_span_scrub,
    "allpairs": op_allpairs,
    "shared_passages": op_shared_passages,
    "minhash_bucketed": op_minhash_bucketed,
    "lm_familiarity": op_lm_familiarity,
    "semantic_dedup": op_semantic_dedup,
    "cc_10m": op_cc_10m,
}


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if len(sys.argv) > 1:
        op = sys.argv[1]
        t0 = time.time()
        out = OPS[op]()
        out.update({
            "op": op, "sec": round(time.time() - t0, 1),
            "driver_rss_mb": resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss // 1024,
        })
        print("STRESS " + json.dumps(out))
        import ray

        if ray.is_initialized():
            ray.shutdown()
        return
    for op in OPS:
        r = subprocess.run([sys.executable, __file__, op],
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("STRESS "):
                print(line[7:], flush=True)
                break
        else:
            print(json.dumps({"op": op, "error": r.stderr[-800:]}),
                  flush=True)


if __name__ == "__main__":
    main()
