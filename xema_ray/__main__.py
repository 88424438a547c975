"""CLI — ``python -m xema_ray <command>``.

Commands:
  validate   checkpointed corpus validation (resumable)
  stats      per-column statistics
  drift      capture/compare token-length distributions
  gen        generate the deterministic synthetic corpus

The CLI owns its Ray session (ray.init/shutdown); library code never does.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _paths(spec: str) -> list:
    if os.path.isdir(spec):
        return sorted(
            p for p in glob.glob(os.path.join(spec, "*.parquet"))
            if not os.path.basename(p).startswith("sources")
        )
    out = sorted(glob.glob(spec))
    if not out:
        raise SystemExit(f"no parquet files match {spec!r}")
    return out


def cmd_validate(args):
    _init_ray(args.num_cpus)
    from xema_ray.schema.json_schema import from_json_schema
    from xema_ray.state.checkpoint import run_validation

    compiled = None
    if args.schema:
        with open(args.schema) as f:
            compiled = from_json_schema(json.load(f))
    summary = run_validation(
        _paths(args.input), args.out, compiled=compiled,
        fail=args.fail, batch_rows=args.batch_rows,
        with_checks=args.with_checks, clean_dir=args.clean_dir,
        quarantine=args.quarantine,
    )
    out = {
        "rows": summary.rows,
        "valid_rows": summary.valid_rows,
        "violations": summary.violations,
        "pass": summary.passed,
        "partitions_done": summary.partitions_done,
        "partitions_skipped": summary.partitions_skipped,
        "keyword_counts": summary.keyword_counts,
        "manifest": summary.manifest_path,
    }
    if args.quarantine:
        out["partitions_quarantined"] = summary.partitions_quarantined
        out["quarantine"] = summary.quarantine_path
    print(json.dumps(out, indent=2))


def cmd_stats(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    from xema_ray.stages.stats import column_stats

    stats = column_stats(rd.read_parquet(_paths(args.input)))
    if args.quantiles:
        from xema_ray.stages.quantiles import exact_quantiles

        col, _, qspec = args.quantiles.partition("=")
        qs = [float(x) for x in (qspec or "0.25,0.5,0.75,0.99").split(",")]
        t = exact_quantiles(
            rd.read_parquet(_paths(args.input), columns=[col]), col, qs)
        stats.setdefault(col, {})["quantiles"] = {
            f"{q_fp / 1e6:g}": v
            for q_fp, v in zip(t["q_fp"].to_pylist(), t["value"].to_pylist())
        }
    print(json.dumps(stats, indent=2, default=str))


def cmd_drift(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    from xema_ray.stages.checks import (
        capture_reference, drift_report, reference_from_json, reference_to_json,
    )

    if args.capture:
        ref = capture_reference(rd.read_parquet(_paths(args.input)),
                                key=args.key, list_col=args.list_col)
        with open(args.capture, "w") as f:
            json.dump(reference_to_json(ref), f)
        print(f"captured reference distributions for {len(ref)} keys -> {args.capture}")
        return
    with open(args.reference) as f:
        ref = reference_from_json(json.load(f))
    rep = drift_report(rd.read_parquet(_paths(args.input)), ref,
                       key=args.key, list_col=args.list_col)
    print(json.dumps(rep, indent=2))


def cmd_dedup(args):
    _init_ray(args.num_cpus)
    import dataclasses
    import json as _json

    from xema_ray.state.checkpoint import run_exact_dedup

    summary = run_exact_dedup(
        _paths(args.input), args.out, col=args.col, id_col=args.id_col,
        hash_fn=args.hash_fn, batch_rows=args.batch_rows,
        prior_dirs=args.prior or None)
    print(_json.dumps(dataclasses.asdict(summary), indent=2))


def cmd_compact(args):
    _init_ray(args.num_cpus)
    import dataclasses
    import json as _json

    from xema_ray.state.checkpoint import run_compact_shards

    summary = run_compact_shards(
        _paths(args.input), args.out, target_rows=args.target_rows,
        row_group_rows=args.row_group_rows)
    print(_json.dumps(dataclasses.asdict(summary), indent=2))


def cmd_gen(args):
    from xema_ray.sources.corpus import write_corpus

    out = write_corpus(args.out, args.rows, n_files=args.files, seed=args.seed,
                       shifted=args.shifted, clean=args.clean)
    print(out)


def cmd_chunk(args):
    _init_ray(args.num_cpus)
    import dataclasses
    from functools import partial

    from xema_ray.stages.chunk import chunk_batch
    from xema_ray.state.checkpoint import run_map_shards

    summary = run_map_shards(
        _paths(args.input), args.out,
        partial(chunk_batch, text_col=args.text_col, id_col=args.id_col,
                size=args.size, stride=args.stride),
        columns=[args.id_col, args.text_col],
        cfg_sig=f"chunk:{args.text_col}:{args.id_col}:"
                f"{args.size}:{args.stride}")
    print(json.dumps(dataclasses.asdict(summary)))


def cmd_scrub(args):
    _init_ray(args.num_cpus)
    import dataclasses
    from functools import partial

    import ray.data as rd

    from xema_ray.stages.pii import DEFAULT_PII_PATTERNS, scrub_batch
    from xema_ray.state.checkpoint import run_map_shards

    pat_sig = ",".join(name for name, _, _ in DEFAULT_PII_PATTERNS)
    summary = run_map_shards(
        _paths(args.input), args.out,
        partial(scrub_batch, text_col=args.text_col),
        cfg_sig=f"scrub:{args.text_col}:{pat_sig}")
    # totals from the written output's count columns — one pruned read,
    # per-batch partials merged on the driver (no pipeline re-execution)
    import pyarrow as pa_
    import pyarrow.compute as pc_

    cols = [f"n_{name}" for name, _, _ in DEFAULT_PII_PATTERNS]

    def part(t):
        return pa_.table({c: [pc_.sum(t[c]).as_py() or 0] for c in cols})

    parts = rd.read_parquet(os.path.join(args.out, "shards"),
                            columns=cols).map_batches(
        part, batch_format="pyarrow").take_all()
    totals = {c: int(sum(r[c] for r in parts)) for c in cols}
    print(json.dumps({**dataclasses.asdict(summary), **totals}))


def cmd_sample(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    from xema_ray.stages.sample import mixture_sample, stratified_sample

    ds = rd.read_parquet(_paths(args.input))
    if args.weights:
        weights = json.loads(args.weights)
        out = mixture_sample(ds, weights, args.budget,
                             strat_col=args.strat_col, id_col=args.id_col,
                             default_weight=args.default_weight,
                             hash_fn=args.hash_fn)
    else:
        out = stratified_sample(ds, rates={}, strat_col=args.strat_col,
                                id_col=args.id_col, default_rate=args.rate,
                                hash_fn=args.hash_fn)
    out.write_parquet(args.out)
    print(json.dumps({"rows": rd.read_parquet(args.out).count(),
                      "out": args.out}))


def cmd_infer(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    from xema_ray.schema.infer import (profile_dataset, schema_from_profile)

    ds = rd.read_parquet(_paths(args.input))
    prof = profile_dataset(ds)
    dsl = schema_from_profile(prof)
    out = {"profile": prof,
           # display form (tuples render as JSON lists); the programmatic
           # path is compile_schema(infer_schema(ds))
           "schema_dsl": dsl}
    if args.validate:
        from xema_ray.schema.builder import compile_schema
        from xema_ray.stages.validate import validate_dataset

        res = validate_dataset(ds, compile_schema(dsl))
        out["self_check"] = res.verdict()
    print(json.dumps(out, indent=2, default=str))


def cmd_linededup(args):
    _init_ray(args.num_cpus)
    import dataclasses

    import ray.data as rd

    from xema_ray.stages.linededup import run_line_dedup

    summary = run_line_dedup(_paths(args.input), args.out,
                             text_col=args.text_col, id_col=args.id_col,
                             words_per_line=args.words_per_line,
                             max_docs=args.max_docs,
                             batch_rows=args.batch_rows)
    agg = rd.read_parquet(args.out + "/shards")
    n_lines = agg.sum("n_lines")
    n_kept = agg.sum("n_kept")
    out = dataclasses.asdict(summary)
    out.update({"lines": n_lines, "kept": n_kept,
                "removed": n_lines - n_kept})
    print(json.dumps(out))



def cmd_spandedup(args):
    _init_ray(args.num_cpus)
    import dataclasses

    import ray.data as rd

    from xema_ray.stages.dedup import run_span_dedup

    summary = run_span_dedup(_paths(args.input), args.out,
                             n=args.ngram, min_count=args.min_count,
                             text_col=args.text_col, id_col=args.id_col,
                             batch_rows=args.batch_rows)
    agg = rd.read_parquet(args.out + "/shards")
    n_words = agg.sum("n_words")
    n_removed = agg.sum("n_removed")
    out = dataclasses.asdict(summary)
    out.update({"words": n_words, "removed": n_removed})
    print(json.dumps(out))


def cmd_neardup(args):
    """Near-dup pipeline over parquet shards: candidate pairs -> exact-
    Jaccard verification -> connected-component cluster resolution ->
    survivor corpus (min-id per cluster kept), CHECKPOINTED through the
    ``state/checkpoint`` manifest contract (r5): pairs/clusters persist
    as signed artifacts, survivors write per-shard with manifest resume
    — a killed multi-hour job reruns only what didn't land.  Outputs
    ``<out>/pairs.parquet``, ``<out>/clusters.parquet`` and
    ``<out>/survivors/shards/``; only the duplicate-membership set
    (bounded by dup docs, not corpus size) ever reaches the driver."""
    _init_ray(args.num_cpus)
    import dataclasses

    from xema_ray.stages.dedup import run_near_dedup

    summary = run_near_dedup(_paths(args.input), args.out,
                             threshold=args.threshold,
                             candidates=args.candidates,
                             verify=args.verify,
                             text_col=args.text_col, id_col=args.id_col)
    out = dataclasses.asdict(summary)
    out["threshold"] = args.threshold
    print(json.dumps(out))


def cmd_bpe(args):
    """Train a BPE merge table (one word-count fold + driver merges) and
    save it as a parquet artifact, or apply a saved table to report
    per-source word/subword totals."""
    _init_ray(args.num_cpus)
    import pyarrow as pa
    import ray.data as rd

    from xema_ray.stages.bpe import (bpe_doc_stats, learn_bpe,
                                     load_merges, save_merges)

    if args.apply:
        merges = load_merges(args.apply)
        ds = rd.read_parquet(_paths(args.input),
                             columns=[args.id_col, "source",
                                      args.text_col])
        stats = bpe_doc_stats(ds, merges, text_col=args.text_col)

        def partial(t: pa.Table) -> pa.Table:
            import numpy as np

            t = t.append_column(
                "n_docs", pa.array(np.ones(t.num_rows, np.int64)))
            return t.select(["source", "n_docs", "n_words",
                             "n_subwords"]).group_by("source").aggregate(
                [("n_docs", "sum"), ("n_words", "sum"),
                 ("n_subwords", "sum")])

        parts = [b for b in stats.map_batches(
            partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if b.num_rows]
        if parts:
            agg = pa.concat_tables(parts).group_by("source").aggregate(
                [("n_docs_sum", "sum"), ("n_words_sum", "sum"),
                 ("n_subwords_sum", "sum")])
            rows = {r["source"]: {"n_docs": r["n_docs_sum_sum"],
                                  "n_words": r["n_words_sum_sum"],
                                  "n_subwords": r["n_subwords_sum_sum"]}
                    for r in agg.to_pylist()}
        else:
            rows = {}
        print(json.dumps({"merges": len(merges), "by_source": rows},
                         sort_keys=True))
        return
    ds = rd.read_parquet(_paths(args.input), columns=[args.text_col])
    merges = learn_bpe(ds, n_merges=args.merges, text_col=args.text_col)
    out = save_merges(merges, args.out)
    print(json.dumps({"merges": len(merges), "out": out}))


def cmd_diff(args):
    """Classify every doc across two snapshot directories (added /
    removed / changed / unchanged) — the daily-ingest delta report.
    Content never moves: each side reduces to (id, digest) rows before
    one full-outer hash join.  `--out` additionally writes the per-id
    status table as parquet."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from xema_ray.stages.diff import diff_counts, snapshot_diff

    cur = rd.read_parquet(_paths(args.current),
                          columns=[args.id_col, args.content_col])
    prev = rd.read_parquet(_paths(args.previous),
                           columns=[args.id_col, args.content_col])
    d = snapshot_diff(cur, prev, id_col=args.id_col,
                      content_col=args.content_col,
                      hash_fn=args.hash_fn)
    if args.out:
        if os.path.isdir(args.out) and os.listdir(args.out):
            raise SystemExit(
                f"--out {args.out} exists and is not empty; Ray appends "
                "uniquely-named files, so stale results would pollute "
                "the status table — pass a fresh directory")
        # write the status table, then count from the files — one
        # execution, no driver-side materialization of the id table
        d.write_parquet(args.out)
        d = rd.read_parquet(args.out)
    print(json.dumps(diff_counts(d)))


def cmd_explain(args):
    """Run one registered query and print its Ray Data execution stats —
    the measure-don't-guess loop surfaced as a CLI (per-operator wall
    time, blocks, rows, memory; `ds.stats()` verbatim)."""
    import time

    _init_ray(args.num_cpus)
    from xema_ray.pipelines.queries import QUERIES

    if args.query not in QUERIES:
        import difflib

        near = difflib.get_close_matches(args.query, QUERIES, n=5)
        raise SystemExit(
            f"unknown query {args.query!r}; close matches: {near}; "
            f"{len(QUERIES)} registered (see COVERAGE.md)")
    t0 = time.time()
    res = QUERIES[args.query].fn(args.sf_dir)
    rows = 0
    stats = None
    if hasattr(res, "iter_batches"):  # ray Dataset: drain + stats
        for b in res.iter_batches(batch_format="pyarrow"):
            rows += b.num_rows
        stats = res.stats()
    else:  # pandas / pyarrow driver-sized result
        rows = len(res)
    dt = time.time() - t0
    doc = QUERIES[args.query].doc
    if doc:
        print(f"# {args.query}: {doc}\n")
    if stats:
        print(stats)
    print(json.dumps({"query": args.query, "sf_dir": args.sf_dir,
                      "rows": rows, "sec": round(dt, 3)}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="xema_ray")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="checkpointed corpus validation")
    v.add_argument("input", help="directory or glob of parquet shards")
    v.add_argument("out", help="output dir (violations/ + manifest.jsonl)")
    v.add_argument("--schema", help="JSON-Schema file (default: flagship sequences schema)")
    v.add_argument("--fail", choices=["immediately", "early", "finally", "all"], default="all")
    v.add_argument("--batch-rows", type=int, default=8192)
    v.add_argument("--with-checks", action="store_true",
                   help="fuse stats/HLL/drift/referential/uniqueness into the same pass")
    v.add_argument("--clean-dir", help="also write rows that passed, one shard per input shard")
    v.add_argument("--quarantine", action="store_true",
                   help="set unreadable shards aside in quarantine.jsonl "
                        "instead of failing the run")
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("stats", help="per-column statistics")
    s.add_argument("input")
    s.add_argument("--quantiles", metavar="COL[=Q,Q,...]",
                   help="exact distributed quantiles of COL "
                        "(default qs 0.25,0.5,0.75,0.99)")
    s.set_defaults(fn=cmd_stats)

    d = sub.add_parser("drift", help="capture or compare length distributions")
    d.add_argument("input")
    d.add_argument("--capture", help="write reference JSON here instead of comparing")
    d.add_argument("--reference", help="reference JSON (from --capture)")
    d.add_argument("--key", default="source")
    d.add_argument("--list-col", default="tokens")
    d.set_defaults(fn=cmd_drift)

    dd = sub.add_parser(
        "dedup", help="checkpointed exact content dedup (resumable; "
                      "--prior dedupes against previous runs' digests)")
    dd.add_argument("input", help="directory or glob of parquet shards")
    dd.add_argument("out", help="output dir (partials/ clean/ manifest.jsonl)")
    dd.add_argument("--col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--hash-fn", choices=["fast", "md5"], default="fast")
    dd.add_argument("--batch-rows", type=int, default=16384)
    dd.add_argument("--prior", action="append",
                    help="prior run out_dir (repeatable): incremental dedup "
                         "against its digest partials")
    dd.set_defaults(fn=cmd_dedup)

    cp = sub.add_parser(
        "compact", help="pack small parquet shards into ~target-rows "
                        "shards (checkpointed, resumable)")
    cp.add_argument("input", help="directory or glob of parquet shards")
    cp.add_argument("out", help="output dir (shards/ + manifest.jsonl)")
    cp.add_argument("--target-rows", type=int, default=1_000_000)
    cp.add_argument("--row-group-rows", type=int, default=65536)
    cp.set_defaults(fn=cmd_compact)

    c = sub.add_parser("chunk", help="split documents into fixed-size "
                                     "overlapping windows")
    c.add_argument("input")
    c.add_argument("out")
    c.add_argument("--text-col", default="text")
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--size", type=int, default=2048)
    c.add_argument("--stride", type=int, default=1536)
    c.set_defaults(fn=cmd_chunk)

    sc = sub.add_parser("scrub", help="redact PII (email/SSN/phone/IPv4) "
                                      "from a text column")
    sc.add_argument("input")
    sc.add_argument("out")
    sc.add_argument("--text-col", default="text")
    sc.set_defaults(fn=cmd_scrub)

    sm = sub.add_parser(
        "sample", help="deterministic hash sampling (uniform --rate, or "
                       "--weights JSON + --budget for domain mixture)")
    sm.add_argument("input")
    sm.add_argument("out")
    sm.add_argument("--rate", type=float, default=0.1)
    sm.add_argument("--weights", help='JSON dict source->target weight, '
                                      'e.g. \'{"web":0.6,"code":0.4}\'')
    sm.add_argument("--budget", type=float, default=1_000_000,
                    help="target output rows for --weights mode")
    sm.add_argument("--default-weight", type=float, default=0.0)
    sm.add_argument("--strat-col", default="source")
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--hash-fn", choices=["fast", "md5"], default="fast")
    sm.set_defaults(fn=cmd_sample)

    inf = sub.add_parser(
        "infer", help="profile a corpus and propose a schema "
                      "(bounds, lengths, enums, required)")
    inf.add_argument("input")
    inf.add_argument("--validate", action="store_true",
                     help="also run the inferred schema back over the "
                          "corpus and report the verdict")
    inf.set_defaults(fn=cmd_infer)

    ld = sub.add_parser(
        "linededup", help="remove lines repeated across >max-docs "
                          "documents (CCNet-style boilerplate removal)")
    ld.add_argument("input")
    ld.add_argument("out")
    ld.add_argument("--text-col", default="text")
    ld.add_argument("--id-col", default="doc_id")
    ld.add_argument("--words-per-line", type=int, default=8)
    ld.add_argument("--max-docs", type=int, default=1)
    ld.add_argument("--batch-rows", type=int, default=16384)
    ld.set_defaults(fn=cmd_linededup)

    sd = sub.add_parser(
        "spandedup", help="excise word spans whose n-grams repeat "
                          ">=min-count times corpus-wide (Lee et al. "
                          "2021 substring dedup); checkpointed/resumable")
    sd.add_argument("input")
    sd.add_argument("out")
    sd.add_argument("--text-col", default="text")
    sd.add_argument("--id-col", default="doc_id")
    sd.add_argument("--ngram", type=int, default=8)
    sd.add_argument("--min-count", type=int, default=2)
    sd.add_argument("--batch-rows", type=int, default=16384)
    sd.set_defaults(fn=cmd_spandedup)


    nd = sub.add_parser(
        "neardup", help="MinHash-LSH near-dedup: verified pairs + "
                        "connected-component clusters + survivor corpus")
    nd.add_argument("input")
    nd.add_argument("out")
    nd.add_argument("--threshold", type=float, default=0.8,
                    help="exact n-gram-Jaccard cut for a duplicate pair")
    nd.add_argument("--text-col", default="text")
    nd.add_argument("--id-col", default="doc_id")
    nd.add_argument("--verify", choices=["exact", "hash"], default="hash",
                    help="pair verification lane (hash = searchsorted "
                         "over broadcast gram-hash sets)")
    nd.add_argument("--candidates", choices=["minhash", "allpairs"],
                    default="minhash",
                    help="candidate generation: minhash LSH (probabilistic "
                         "recall, cheapest at scale) or the exact "
                         "prefix-filtered self-join (guaranteed recall)")
    nd.set_defaults(fn=cmd_neardup)

    bp = sub.add_parser(
        "bpe", help="train a BPE merge table (word-count fold + driver "
                    "merges) or apply a saved one (--apply)")
    bp.add_argument("input")
    bp.add_argument("out", nargs="?", default="bpe_merges.parquet")
    bp.add_argument("--apply", default=None,
                    help="path of a saved merge table to apply instead "
                         "of training")
    bp.add_argument("--merges", type=int, default=200)
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--id-col", default="doc_id")
    bp.set_defaults(fn=cmd_bpe)

    df = sub.add_parser(
        "diff", help="snapshot delta report: classify docs across two "
                     "corpus versions (digest-only full-outer join)")
    df.add_argument("current")
    df.add_argument("previous")
    df.add_argument("--out", default=None,
                    help="also write the per-id status table here")
    df.add_argument("--id-col", default="doc_id")
    df.add_argument("--content-col", default="text")
    df.add_argument("--hash-fn", default="fast", choices=["fast", "md5"])
    df.set_defaults(fn=cmd_diff)

    ex = sub.add_parser("explain",
                        help="run a registered query and print ds.stats()")
    ex.add_argument("query", help="query name from the registry")
    ex.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ex.set_defaults(fn=cmd_explain)

    g = sub.add_parser("gen", help="generate the synthetic sequences corpus")
    g.add_argument("out")
    g.add_argument("--rows", type=int, default=100_000)
    g.add_argument("--files", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--shifted", action="store_true")
    g.add_argument("--clean", action="store_true")
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
