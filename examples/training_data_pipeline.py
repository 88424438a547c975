"""Example: a composed training-data pipeline over the documents table —
declarative schema, validation, quality filtering, exact + near dedup,
language ID, fingerprints, and a resumable partitioned parquet sink.

    python examples/training_data_pipeline.py [sf_dir]
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

from xema_ray import compile_schema, validation_message
from xema_ray.stages.dedup import exact_dedup, minhash_lsh_pairs
from xema_ray.stages.text import lang_id, quality_scores, token_counts
from xema_ray.stages.validate import validate_dataset

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# 1. declarative document schema (tuple DSL; JSON Schema works too)
schema = compile_schema(("map", {
    "properties": {
        "doc_id": ("integer", {"minimum": 0}),
        "text": ("string", {"min_length": 1}),
        "lang": (["string", "nil"], {}),
    },
    "required": ["doc_id", "text"],
}))

docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text", "lang"])

# 2. validate (vectorized kernels), keep the clean rows
res = validate_dataset(docs, schema, id_col="doc_id", keep_details=False)
clean = res.clean()

# 3. text analysis: token counts + quality signals + language ID
enriched = lang_id(quality_scores(token_counts(clean)))

# 4. quality filter (vectorized expression over the enriched columns)
import pyarrow.compute as pc


def quality_gate(t):
    keep = pc.and_(pc.greater_equal(t["n_words"], 5),
                   pc.greater(t["alpha_ratio"], 0.4))
    return t.filter(keep)


filtered = enriched.map_batches(quality_gate, batch_format="pyarrow")

# 5. exact dedup (duplicate-loser broadcast — driver never holds the corpus)
deduped = exact_dedup(filtered, col="text", id_col="doc_id")

# 6. resumable partitioned sink
out_dir = tempfile.mkdtemp(prefix="pipeline_out_", dir="/tmp")
deduped.write_parquet(out_dir)

# 6b. checkpointed dedup over raw shards (state/checkpoint.run_exact_dedup):
# the manifest/resume layer for the dedup phase itself — a run killed
# between tasks resumes to byte-identical survivor partitions
from xema_ray.state.checkpoint import run_exact_dedup

ckpt_dir = tempfile.mkdtemp(prefix="dedup_ckpt_", dir="/tmp")
summary = run_exact_dedup([os.path.join(sf_dir, "documents.parquet")],
                          ckpt_dir, col="text", id_col="doc_id")
print(f"checkpointed dedup: {summary.rows} rows -> {summary.survivors} "
      f"survivors ({summary.dup_groups} dup groups), "
      f"resume skipped={summary.partitions_skipped}")

# 7. near-duplicate report on the surviving docs (banded MinHash-LSH)
pairs = minhash_lsh_pairs(deduped, threshold=0.8).take_all()

n_out = rd.read_parquet(out_dir).count()
print(f"input rows:      {docs.count()}")
print(f"clean rows:      {clean.count()}")
print(f"after filters:   {filtered.count()}")
print(f"after dedup:     {n_out}  -> {out_dir}")
print(f"near-dup pairs:  {len(pairs)}")

# 8. the reference-exact error message for one invalid value
bad = {"doc_id": -1, "text": ""}  # string-keyed like the schema
print("sample error:", validation_message(schema, bad))

ray.shutdown()
