"""Connected components over a candidate-pair graph — near-duplicate
CLUSTER resolution at corpus scale.

The near-dup stages (``stages/dedup.py`` MinHash/SimHash,
``stages/similarity.py`` embedding cosine) emit verified PAIRS; actual
deduplication needs the transitive closure — one cluster per connected
component, one survivor per cluster (the reference engine has no graph
surface; this is a training-data addition, task brief "Deduplication").

Ray Data has no graph API; the engine uses **edge contraction with a
broadcast label table** (the parent-pointer contraction family of
Kiveris et al., CIKM'14 "Connected Components in MapReduce and Beyond"),
shaped around one asymmetry: the EDGE list can be huge (near-clique
clusters are quadratic in members) and stays distributed, while the
NODE set is the duplicate subset — rare relative to the corpus by the
same rarity assumption ``exact_dedup`` documents for its loser
broadcast — and fits the driver (16 bytes/node; 50M dup docs ≈ 800 MB).
Each round is therefore shuffle-free:

1. **hop partials** — ``map_batches`` over the symmetric edge list
   emits per-block ``(u, min v)`` pairs (≤ block's distinct-u rows);
   the driver merges them into ``lbl(u) = min(u, neighbours)``.
2. **compress** — full pointer-jumping to idempotence in numpy on the
   driver (microseconds; this is what makes path-shaped graphs contract
   geometrically — a fixed doubling depth leaves labels shifting
   injectively and nothing merges).
3. **contract** — edges stream through a ``map_batches`` lookup against
   the ``ray.put`` label arrays: endpoints relabel, self-edges drop,
   block-local dups collapse (global dups are merged by the next hop's
   min anyway).  The graph SHRINKS each round: near-dup graphs usually
   finish in 2 rounds, sparse random graphs ~4-5 (measured), paths 1.
4. the composed original-node → representative map lives on the driver
   and is returned as a fresh Dataset.

Termination is exact: the component minimum always labels itself, any
surviving cross-label edge strictly decreases a label next hop, so
``edges == ∅`` IS the fixed point and reps are component minima.

A note on iterative Ray Data loops (measured, Ray 2.49): ``union``-free
linear lineage is deliberate here.  Branching plans double the logical
DAG every round (``materialize()`` does NOT drop plan history) and
``union`` doubles block counts — a previous fully-distributed revision
of this file slowed 2x per round from both.  The per-round
``materialize()`` on the (shrinking) edge list keeps lineage shallow and
is bounded by the pair-graph size, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sym_edges(pairs, u_col: str, v_col: str):
    """(u, v) ∪ (v, u) as int64, null endpoints dropped."""
    import pyarrow.compute as pc

    def fn(tbl: pa.Table) -> pa.Table:
        u = pc.cast(tbl[u_col], pa.int64())
        v = pc.cast(tbl[v_col], pa.int64())
        keep = pc.and_(pc.is_valid(u), pc.is_valid(v))
        u, v = u.filter(keep), v.filter(keep)
        return pa.table({
            "u": pa.chunked_array([u, v]).combine_chunks(),
            "v": pa.chunked_array([v, u]).combine_chunks(),
        })

    return pairs.map_batches(fn, batch_format="pyarrow")


def _hop_labels(cur) -> tuple:
    """Driver-merged ``lbl(u) = min(u, neighbours(u))`` over the current
    edge list: per-block partial mins (node-bounded), then one numpy
    merge.  Returns (nodes sorted, labels) arrays."""
    def partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        un, inv = np.unique(u, return_inverse=True)
        mn = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, v)
        return pa.table({"u": un, "mv": mn})

    rows = cur.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    u = np.array([r["u"] for r in rows], dtype=np.int64)
    mv = np.array([r["mv"] for r in rows], dtype=np.int64)
    un, inv = np.unique(u, return_inverse=True)
    mn = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(mn, inv, mv)
    return un, np.minimum(un, mn)


def _compress(nodes: np.ndarray, lbl: np.ndarray) -> np.ndarray:
    """Full pointer-jumping to idempotence: lbl ← lbl(lbl) until stable.
    Labels are node ids, so lookup is a searchsorted over ``nodes``."""
    while True:
        idx = np.searchsorted(nodes, lbl)
        nxt = lbl[idx]
        if np.array_equal(nxt, lbl):
            return lbl
        lbl = nxt


def _cc_bucketed(cur, max_rounds: int, n_buckets: int = None):
    """Connected components with the LABEL TABLE sharded across object-
    store buckets (r4 verdict item 8 — the opt-in spill path for node
    sets beyond driver RAM): every round's ``lbl(u) = min(u, nbrs)``
    merge runs as a raw-task hash exchange on ``u % B`` with
    ``num_returns=B`` map shards (a reducer pulls only its own bucket's
    bytes — the :func:`~xema_ray.stages.stats.u64_key_exchange` shape),
    pointer-jumping compresses per bucket with owner-bucket lookups
    (labels are node ids and edges are symmetric, so every label lives
    in its owner bucket), and contraction relabels edge blocks against
    the bucket refs.  The driver holds ONLY object refs and per-round
    change counters — never a node or label array; a task holds its own
    bucket plus zero-copy plasma reads of the owner buckets its labels
    hash into (at cluster scale it pulls only those buckets' bytes).
    Returns per-bucket ``(node, lbl)`` Arrow-table refs for the
    COMPOSED original-node → representative map, or ``None`` for an
    empty graph.
    """
    import ray

    if n_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_buckets = max(2, cpus // 2)
    nb = n_buckets

    def _rep_lookup(vals, nodes_refs, lbl_refs):
        """rep(vals) via owner-bucket lookups; misses keep their value.
        Runs INSIDE tasks — pulls only the owner buckets it touches."""
        import ray as _ray

        out = vals.copy()
        owner = (vals % nb).astype(np.int64)
        for o in np.unique(owner):
            nodes_o = _ray.get(nodes_refs[int(o)])
            if not len(nodes_o):
                continue
            lbl_o = _ray.get(lbl_refs[int(o)])
            m = owner == o
            idx = np.clip(np.searchsorted(nodes_o, vals[m]), 0,
                          len(nodes_o) - 1)
            hit = nodes_o[idx] == vals[m]
            out[m] = np.where(hit, lbl_o[idx], vals[m])
        return out

    @ray.remote
    def hop_map(*tbls):
        """Per-block (u, min v) partials, hash-split into nb bucket
        shards returned as SEPARATE objects."""
        parts = [[] for _ in range(nb)]
        for t in tbls:
            if t.num_rows == 0 or "u" not in t.column_names:
                continue  # zero-row blocks may carry a schemaless shell
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            un, inv = np.unique(u, return_inverse=True)
            mn = np.full(len(un), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mn, inv, v)
            b = (un % nb).astype(np.int64)
            offs = np.concatenate([[0], np.cumsum(
                np.bincount(b, minlength=nb))])
            order = np.argsort(b, kind="stable")
            us, ms = un[order], mn[order]
            for i in range(nb):
                parts[i].append((us[offs[i]:offs[i + 1]],
                                 ms[offs[i]:offs[i + 1]]))
        e = np.empty(0, np.int64)
        return tuple(
            (np.concatenate([p[0] for p in parts[i]]) if parts[i] else e,
             np.concatenate([p[1] for p in parts[i]]) if parts[i] else e)
            for i in range(nb))

    @ray.remote(num_returns=2)
    def hop_reduce(*parts):
        """Fold one bucket's (u, min v) shards into sorted
        ``(nodes, lbl=min(u, min v))`` arrays (two separate objects)."""
        us = [p[0] for p in parts if len(p[0])]
        ms = [p[1] for p in parts if len(p[0])]
        if not us:
            e = np.empty(0, np.int64)
            return e, e
        u = np.concatenate(us)
        m = np.concatenate(ms)
        un, inv = np.unique(u, return_inverse=True)
        mn = np.full(len(un), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, m)
        return un, np.minimum(un, mn)

    @ray.remote(num_returns=2)
    def jump(i, nodes_refs, lbl_refs):
        """One pointer-jump for bucket i: lbl <- lbl(lbl); returns the
        new labels plus how many changed (the only thing the driver
        reads)."""
        import ray as _ray

        lbl_b = _ray.get(lbl_refs[i])
        new = _rep_lookup(lbl_b, nodes_refs, lbl_refs)
        return new, int((new != lbl_b).sum())

    @ray.remote
    def compose(total, nodes_refs, lbl_refs):
        # ``total`` arrives RESOLVED (top-level ref arg); the per-bucket
        # label refs stay refs inside the lists for selective pulls
        return _rep_lookup(total, nodes_refs, lbl_refs)

    @ray.remote
    def arr_len(a):
        return len(a)

    @ray.remote
    def to_table(n, t):
        return pa.table({"node": n, "lbl": t})

    orig_nodes_refs = None   # per-bucket node-array refs, fixed round 1
    total_refs = None        # composed orig -> representative, refs

    for _ in range(max_rounds):
        blocks = cur.to_arrow_refs()
        if not blocks:
            break
        nt = min(len(blocks), max(2, nb // 2))
        shard_refs = [hop_map.options(num_returns=nb).remote(
            *blocks[i::nt]) for i in range(nt)]
        if nb == 1:
            shard_refs = [[r] for r in shard_refs]
        out_pairs = [hop_reduce.remote(*[s[i] for s in shard_refs])
                     for i in range(nb)]
        nodes_refs = [p[0] for p in out_pairs]
        lbl_refs = [p[1] for p in out_pairs]
        if sum(ray.get([arr_len.remote(n) for n in nodes_refs])) == 0:
            break
        # pointer jumping to idempotence, per bucket
        while True:
            outs = [jump.remote(i, nodes_refs, lbl_refs)
                    for i in range(nb)]
            changed = sum(ray.get([o[1] for o in outs]))
            lbl_refs = [o[0] for o in outs]
            if not changed:
                break
        if orig_nodes_refs is None:
            orig_nodes_refs = nodes_refs
            total_refs = lbl_refs
        else:
            total_refs = [compose.remote(t, nodes_refs, lbl_refs)
                          for t in total_refs]

        def contract(t: pa.Table, nr=tuple(nodes_refs),
                     lr=tuple(lbl_refs)) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            nu = _rep_lookup(u, list(nr), list(lr))
            nv = _rep_lookup(v, list(nr), list(lr))
            keep = nu != nv
            e = np.stack([nu[keep], nv[keep]])
            if e.shape[1]:
                e = np.unique(e, axis=1)
            return pa.table({"u": e[0], "v": e[1]})

        cur = cur.map_batches(contract,
                              batch_format="pyarrow").materialize()
        if cur.count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    if orig_nodes_refs is None:
        return None
    return [to_table.remote(n, t)
            for n, t in zip(orig_nodes_refs, total_refs)]


def connected_components(pairs, u_col: str = "doc_a", v_col: str = "doc_b",
                         max_rounds: int = 32, buckets: int = None,
                         labels: str = "driver"):
    """Labels for the connected components of an undirected pair graph.

    Returns a Dataset ``(node: int64, lbl: int64)`` with one row per
    distinct endpoint and ``lbl`` = the minimum node id of its component.

    ``max_rounds`` bounds contraction rounds (~4-5 suffice for any
    measured graph shape; raises RuntimeError rather than returning
    partial labels).  ``buckets`` sizes the sharded label table in the
    bucketed lane (default cpus/2); unused by the driver lane, whose
    rounds are shuffle-free.

    ``labels``: ``"driver"`` (default) merges the label table on the
    driver — right while the node set (the DUPLICATE docs, rare by the
    exact-dedup rarity contract) fits driver RAM (16 B/node; 50M dups ≈
    800 MB).  ``"bucketed"`` (r5, opt-in) shards the label table across
    object-store buckets via :func:`_cc_bucketed` — the spill path for
    corpora whose dup graph outgrows the driver; differential-tested
    against the driver lane.
    """
    import ray
    import ray.data as rd

    cur = _sym_edges(pairs, u_col, v_col).materialize()

    if labels == "bucketed":
        tbl_refs = _cc_bucketed(cur, max_rounds, buckets)
        if not tbl_refs:
            return rd.from_arrow(pa.table(
                {"node": pa.array([], type=pa.int64()),
                 "lbl": pa.array([], type=pa.int64())}))
        # per-bucket (node, lbl) tables stream straight from the object
        # store into the Dataset — the driver never holds the label map
        return rd.from_arrow_refs(tbl_refs)
    if labels != "driver":
        raise ValueError(f"unknown labels {labels!r}")

    orig_nodes = None   # all endpoints, fixed after round 1
    total = None        # composed orig -> current representative

    for _ in range(max_rounds):
        nodes, lbl = _hop_labels(cur)
        if len(nodes) == 0:
            break
        lbl = _compress(nodes, lbl)
        if orig_nodes is None:
            orig_nodes, total = nodes, lbl.copy()
        else:
            # compose: reps absent from this round's node set (already
            # fully contracted components) keep their rep
            idx = np.searchsorted(nodes, total)
            idx = np.clip(idx, 0, max(len(nodes) - 1, 0))
            hit = nodes[idx] == total
            total = np.where(hit, lbl[idx], total)

        ref = ray.put((nodes, lbl))

        def contract(t: pa.Table, ref=ref) -> pa.Table:
            # TASK, not an actor pool: a fresh label table broadcasts
            # every round, so an actor pool would respawn per round
            # (the kmeans_fit/pq_fit lesson); per-task ray.get of the
            # plasma-shared arrays is a zero-copy local read
            nodes_, lbl_ = ray.get(ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            nu = lbl_[np.searchsorted(nodes_, u)]
            nv = lbl_[np.searchsorted(nodes_, v)]
            keep = nu != nv
            e = np.stack([nu[keep], nv[keep]])
            if e.shape[1]:  # block-local dedupe only (cheap, lossless)
                e = np.unique(e, axis=1)
            return pa.table({"u": e[0], "v": e[1]})

        cur = cur.map_batches(contract,
                              batch_format="pyarrow").materialize()
        if cur.count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    if orig_nodes is None:
        return rd.from_arrow(pa.table({"node": pa.array([], type=pa.int64()),
                                       "lbl": pa.array([], type=pa.int64())}))
    return rd.from_arrow(pa.table({"node": orig_nodes, "lbl": total}))


def dup_clusters(pairs, u_col: str = "doc_a", v_col: str = "doc_b",
                 **kw):
    """(doc_id, cluster_id, keep) — the dedup decision table.

    ``cluster_id`` = min doc id of the near-dup component; ``keep`` = 1
    for the survivor (the cluster representative), 0 for every other
    member.  Docs in no pair are absent (they are all keepers).

    Non-integer doc ids are supported through a node-code dictionary:
    the contraction loop runs on dense int64 codes and the output maps
    back.  The dictionary is bounded by PAIR-GRAPH nodes (duplicate
    docs), the same driver bound the label merge already carries — for
    string ids the component minimum is the lexicographically smallest
    member.
    """
    import pyarrow.compute as pc

    sch = pairs.schema(fetch_if_missing=True)
    if sch is None:  # zero-block dataset: any path handles empty
        is_int = True
    else:
        typ = sch.types[sch.names.index(u_col)]
        is_int = pa.types.is_integer(typ) if isinstance(typ, pa.DataType) \
            else np.issubdtype(typ, np.integer)  # pandas-block schema
    if not is_int:
        import ray

        pairs = pairs.materialize()
        # endpoint id set via per-batch pyarrow unique() (r4 advice: no
        # per-element Python loops, and the decode array rides the
        # object store instead of the task closures)
        uniq_parts = []
        for b in pairs.iter_batches(batch_format="pyarrow"):
            both = pa.chunked_array(
                [b[u_col], b[v_col]]).combine_chunks()
            uniq_parts.append(pc.unique(both.drop_null()))
        merged = pc.unique(pa.chunked_array(uniq_parts)
                           .combine_chunks()) if uniq_parts \
            else pa.array([], type=pa.string())
        inv = np.array(sorted(merged.to_pylist(), key=str), dtype=object)
        code_ref = ray.put(pd.Index(inv))
        inv_ref = ray.put(inv)
        out_t = typ if isinstance(typ, pa.DataType) else pa.string()

        def enc(t: pa.Table) -> pa.Table:
            codes = ray.get(code_ref)  # plasma-local read per task
            keep = pc.and_(pc.is_valid(t[u_col]),
                           pc.is_valid(t[v_col]))  # match _sym_edges'
            t = t.filter(keep)                     # null-endpoint drop
            cu = codes.get_indexer(t[u_col].to_pandas())
            cv = codes.get_indexer(t[v_col].to_pandas())
            return pa.table({
                u_col: pa.array(cu, type=pa.int64()),
                v_col: pa.array(cv, type=pa.int64()),
            })

        coded = dup_clusters(
            pairs.map_batches(enc, batch_format="pyarrow"),
            u_col, v_col, **kw)

        def dec(t: pa.Table) -> pa.Table:
            inv_ = ray.get(inv_ref)
            # explicit type: an empty object ndarray would infer a
            # null-typed column and break schema unification downstream
            return pa.table({
                "doc_id": pa.array(inv_[t["doc_id"].to_numpy()],
                                   type=out_t),
                "cluster_id": pa.array(inv_[t["cluster_id"].to_numpy()],
                                       type=out_t),
                "keep": t["keep"],
            })

        return coded.map_batches(dec, batch_format="pyarrow")

    labels = connected_components(pairs, u_col, v_col, **kw)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["node"],
            "cluster_id": t["lbl"],
            "keep": pc.cast(pc.equal(t["node"], t["lbl"]), pa.int64()),
        })

    return labels.map_batches(fin, batch_format="pyarrow")


def near_dup_dedup(ds, pairs, id_col: str = "doc_id",
                   u_col: str = "doc_a", v_col: str = "doc_b", **kw):
    """Filter ``ds`` to near-dup survivors: per connected component of the
    verified pair graph, keep only the min-id member.

    Scale shape mirrors ``exact_dedup``: only the NON-keeper id set (the
    duplicate docs, rare by assumption) is collected and broadcast via
    ``ray.put``; the corpus streams through an ``is_in`` filter.
    """
    import pyarrow.compute as pc

    clusters = dup_clusters(pairs, u_col, v_col, **kw)
    loser_rows = clusters.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], 0)).select(["doc_id"]),
        batch_format="pyarrow",
    ).take_all()  # O(duplicate docs), not O(corpus)
    return drop_ids_filter(ds, id_col, [r["doc_id"] for r in loser_rows])


def drop_ids_filter(ds, id_col: str, drop_ids: list):
    """Stream ``ds`` through a broadcast ``is_in`` DROP filter — the
    shared survivor-filter kernel (near_dup_dedup, the neardup CLI).
    No-op for an empty drop set: ``pa.array([])`` is null-typed and
    ``is_in`` rejects it against a typed id column."""
    import ray
    import pyarrow.compute as pc

    if not drop_ids:
        return ds
    bad = pa.array(sorted(drop_ids, key=str))  # type from the real ids
    ref = ray.put(bad)

    class Keep:
        def __init__(self, r):
            self.bad = ray.get(r)  # one plasma read per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = pc.cast(t[id_col], self.bad.type)
            drop = pc.fill_null(pc.is_in(ids, value_set=self.bad), False)
            return t.filter(pc.invert(drop))

    return ds.map_batches(Keep, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))
