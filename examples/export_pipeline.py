"""Example: the COMPLETE document export story, end to end — every
round-3 export operator composed into one run:

  filter (quality + repetition gates)
    → PII scrub
    → exact dedup (survivor filter)
    → domain-mixture sampling (budgeted reweighting)
    → context-length chunking with overlap
    → deterministic shuffle (reproducible shard + position)
    → partitioned parquet sink

    python examples/export_pipeline.py [sf_dir]
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

import ray.data as rd

from xema_ray.stages.chunk import chunk_documents
from xema_ray.stages.dedup import exact_dedup
from xema_ray.stages.pii import pii_scrub
from xema_ray.stages.sample import mixture_sample, stratum_counts
from xema_ray.stages.shuffle import deterministic_shuffle
from xema_ray.stages.text import repetition_signals

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
n_in = docs.count()

# 1. quality/repetition gate: drop degenerate or boilerplate docs.
#    (signals-only pass; the keep set is broadcast as a filter —
#    repetition is per-doc so this could equally fuse into one stage,
#    as the registered doc_filter_pipeline query does.)
rep = repetition_signals(docs.select_columns(["doc_id", "text"]))
bad = {r["doc_id"] for r in rep.filter(
    lambda r: r["top_word_m"] >= 200_000 or r["dup2_m"] >= 100_000
).take_all()}
bad_ref = ray.put(bad)


def keep_good(batch):
    b = ray.get(bad_ref)
    return batch[~batch["doc_id"].isin(b)]


filtered = docs.map_batches(keep_good, batch_format="pandas")

# 2. PII scrub (chained RE2 redaction), then 3. exact dedup survivors
scrubbed = pii_scrub(filtered).drop_columns(["text"]) \
    .rename_columns({"scrubbed": "text"})
deduped = exact_dedup(scrubbed, col="text", id_col="doc_id")

# 4. domain mixture: rebalance sources toward target weights in a budget
counts = stratum_counts(deduped, "source")
weights = {s: 1.0 / len(counts) for s in counts}      # uniform target
mixed = mixture_sample(deduped, weights, budget=n_in * 0.3,
                       counts=counts)

# 5. context-length chunking, 6. deterministic shuffle over chunk keys
chunks = chunk_documents(mixed, size=512, stride=384)


def add_chunk_key(t):
    import pyarrow as pa
    import pyarrow.compute as pc

    key = pc.binary_join_element_wise(
        pc.cast(t["doc_id"], pa.string()),
        pc.cast(t["chunk_id"], pa.string()), ":")
    return t.append_column("chunk_key", key)


shuffled = deterministic_shuffle(
    chunks.map_batches(add_chunk_key, batch_format="pyarrow"),
    id_col="chunk_key", shards=8)

out_dir = os.path.join(tempfile.gettempdir(), "xema_ray_export_example")
shuffled.write_parquet(out_dir)
n_out = rd.read_parquet(out_dir).count()

print({"rows_in": n_in, "gated_out": len(bad),
       "chunks_exported": n_out, "out": out_dir})

ray.shutdown()
