"""Example: validate the `documents` table against a JSON Schema.

    python examples/validate_documents.py [sf_dir]
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

from xema_ray import format_violations, from_json_schema, validate_dataset

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

schema = from_json_schema({
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "de", "fr", "es", "zh"]},
        "source": {"type": "string", "pattern": "^src[0-9]+$"},
        "n_chars": {"type": "integer", "minimum": 0, "maximum": 100_000},
    },
    "required": ["doc_id", "text", "lang"],
})

ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
result = validate_dataset(ds, schema, id_col="doc_id")

print("verdict:", result.verdict())
sample = result.violations().take(10)
if sample:
    print(format_violations(sample))

ray.shutdown()
