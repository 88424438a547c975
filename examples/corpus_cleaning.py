"""Example: the late-round-3 CLEANING story composed end to end —
the operators a web-scale corpus needs BEFORE export:

  schema inference (profile the delivery, propose + enforce a schema)
    → cross-corpus line dedup (CCNet-style boilerplate removal)
    → corpus-frequency scoring (rare-word gate)
    → shared-passage detection (winnowing fingerprint pairs, reported)
    → tokenize to ids (corpus-derived frequency-ranked vocab)

    python examples/corpus_cleaning.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.compute as pc
import ray.data as rd

from xema_ray.schema.builder import compile_schema
from xema_ray.schema.infer import infer_schema
from xema_ray.stages.dedup import shared_passage_pairs
from xema_ray.stages.linededup import line_dedup
from xema_ray.stages.text import tokenize_ids, word_freq_scores
from xema_ray.stages.validate import validate_dataset

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
n_in = docs.count()

# 1. infer a schema from the delivery itself, then enforce it — the
# self-consistency guarantee means a clean delivery validates 100%
schema = compile_schema(infer_schema(docs))
res = validate_dataset(docs, schema)
v = res.verdict()
print(f"inferred-schema check: {v['valid_rows']}/{v['rows']} rows valid")

# 2. remove boilerplate lines shared across documents
cleaned = line_dedup(docs, words_per_line=8, max_docs=1)
removed = cleaned.map_batches(
    lambda t: t.select(["n_lines", "n_kept"]), batch_format="pyarrow")
tot = removed.sum(["n_lines", "n_kept"])
print(f"line dedup: {tot['sum(n_lines)'] - tot['sum(n_kept)']} "
      f"boilerplate lines removed of {tot['sum(n_lines)']}")

# 3. rare-word gate on the CLEANED text (broadcast corpus vocabulary)
clean_docs = cleaned.map_batches(
    lambda df: df.rename(columns={"clean_text": "text"})[
        ["doc_id", "text"]], batch_format="pandas")
scored = word_freq_scores(clean_docs, rare_below=100)
kept = scored.filter(expr="rare_m < 500000")   # <50% rare words
n_kept = kept.count()
print(f"rare-word gate: kept {n_kept}/{n_in}")

# 4. shared-passage report (winnowing fingerprints; detection only)
pairs = shared_passage_pairs(docs, ngram=3, window=4)
print(f"shared-passage pairs flagged: {pairs.num_rows}")

# 5. tokenize the surviving docs against a corpus-derived ranked vocab
import pyarrow as pa

keep_ids = pa.array(sorted(r["doc_id"] for r in kept.take_all()))
final_docs = clean_docs.map_batches(
    lambda t: t.filter(pc.is_in(t["doc_id"], value_set=keep_ids)),
    batch_format="pyarrow")
ids = tokenize_ids(final_docs)
n_tokens = ids.count()
print(f"tokenized: {n_tokens} token ids over {len(keep_ids)} docs")
print("cleaning_done", n_in, "->", len(keep_ids))

ray.shutdown()
