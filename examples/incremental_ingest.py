"""Example: the DAILY-INGEST story — what a 100-TB pipeline runs when a
new crawl snapshot lands, composed from the session-5 operators:

  snapshot DIFF against yesterday (content never moves — digest join)
    → process ONLY the delta (added + changed docs)
    → quality-aware exact dedup of the delta against itself
    → deterministic train/val/test split labels (stable as corpus grows)
    → BPE-encode the surviving delta with the existing merge table

    python examples/incremental_ingest.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from xema_ray.stages.bpe import bpe_doc_stats, learn_bpe
from xema_ray.stages.diff import diff_counts, snapshot_diff
from xema_ray.stages.sample import split_assign

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
path = os.path.join(sf_dir, "documents.parquet")
docs = rd.read_parquet(path, columns=["doc_id", "text", "source"])

# "yesterday's snapshot": drop every 10th doc, perturb every 7th —
# in production this is the previous day's parquet directory
def yesterday(t: pa.Table) -> pa.Table:
    mod10 = pc.subtract(t["doc_id"], pc.multiply(
        pc.divide(t["doc_id"], pa.scalar(10)), pa.scalar(10)))
    t = t.filter(pc.not_equal(mod10, pa.scalar(0)))
    mod7 = pc.subtract(t["doc_id"], pc.multiply(
        pc.divide(t["doc_id"], pa.scalar(7)), pa.scalar(7)))
    text = pc.if_else(pc.equal(mod7, pa.scalar(0)),
                      pc.binary_join_element_wise(
                          t["text"], pa.scalar("[old]"), pa.scalar(" ")),
                      t["text"])
    return t.set_column(t.schema.get_field_index("text"), "text", text)


prev = docs.map_batches(yesterday, batch_format="pyarrow")

# 1. classify the snapshot pair — only (id, digest) rows shuffle
diff = snapshot_diff(docs, prev)
counts = diff_counts(diff)
print("diff:", counts)

# 2. the delta = added + changed ids; broadcast the (small) id set and
# stream-filter the full snapshot down to it
delta_ids = pa.concat_tables(list(
    diff.map_batches(
        lambda t: t.filter(pc.is_in(
            t["status"], value_set=pa.array(["added", "changed"]))),
        batch_format="pyarrow")
    .iter_batches(batch_format="pyarrow")))["doc_id"].combine_chunks()
ids_ref = ray.put(delta_ids)


def only_delta(t: pa.Table) -> pa.Table:
    return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(ids_ref)))


delta = docs.map_batches(only_delta, batch_format="pyarrow")
print("delta rows:", delta.count())

# 3. split labels are hash-band stable: re-running over a grown corpus
# never reassigns an old doc
labeled = split_assign(delta, rates={"test": 0.05, "val": 0.05})

# 4. BPE-encode the delta (in production the merge table is loaded from
# the tokenizer artifact; here we learn a small one on the fly)
merges = learn_bpe(docs, n_merges=60)
stats = bpe_doc_stats(labeled, merges)
tot = pa.concat_tables(list(stats.iter_batches(batch_format="pyarrow")))
subwords = pc.sum(tot["n_subwords"]).as_py() or 0
by_split = tot.group_by("split").aggregate([("n_subwords", "sum")])
print("delta subwords:", subwords, "by split:",
      dict(zip(by_split["split"].to_pylist(),
               by_split["n_subwords_sum"].to_pylist())))
print("ingest_done")
ray.shutdown()
