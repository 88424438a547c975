"""Example: substring-level dedup (Lee et al. 2021) composed end-to-end —
find duplicated word spans corpus-wide, excise them, then run the
semantic (embedding) near-dup pass on the companion table.

    python examples/substring_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import ray.data as rd

from xema_ray.stages.dedup import dup_spans, remove_spans
from xema_ray.stages.similarity import semantic_dedup

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])

# 1. manifest: maximal word runs whose 8-grams repeat corpus-wide
manifest = dup_spans(docs, n=8, min_count=2)
spans = sum(b.num_rows for b in manifest.iter_batches(batch_format="pyarrow"))

# 2. apply: excise the flagged runs in one streaming pass
scrubbed = remove_spans(docs, manifest)
removed = 0
words = 0
for b in scrubbed.iter_batches(batch_format="pyarrow"):
    removed += sum(b["n_removed"].to_pylist())
    words += sum(b["n_words"].to_pylist())
print(f"dup spans: {spans}; removed {removed}/{words} words")

# 3. semantic near-dups over the embedding table (kmeans blocking)
emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
dropped = semantic_dedup(emb, k=8, iters=3, seed=17, tau=0.4)
n_dropped = sum(b.num_rows
                for b in dropped.iter_batches(batch_format="pyarrow"))
print(f"semantic near-dups dropped: {n_dropped}")

ray.shutdown()
