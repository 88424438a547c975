"""Flagship pipeline — full-schema validation of the sequences corpus.

The end-to-end slice of SURVEY.md §7.3: ``read_parquet(corpus) →
map_batches(SchemaValidator actor pool, zero-copy Arrow) → violations +
clean split + verdict``, against the ``input_hint`` table
``(doc_id, tokens, n_tok, source)``.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.kernels import TableCheck
from xema_ray.schema.builder import compile_schema
from xema_ray.sources.corpus import MAX_LEN, SOURCES, VOCAB
from xema_ray.stages.validate import ValidationResult, validate_dataset

#: The corpus validity schema (Xema DSL form).  Per-keyword provenance:
#: pattern/min-max length → validator.ex:564-596; items element bounds →
#: validator.ex:694-721 + 483-530; enum → validator.ex:346-376; required →
#: validator.ex:861-875.
SEQUENCES_SCHEMA_SRC = (
    "map",
    {
        "properties": {
            "doc_id": ("string", {"pattern": r"^[a-z][a-z-]*-\d{12}$", "min_length": 5, "max_length": 64}),
            "tokens": (
                "list",
                {
                    "items": ("integer", {"minimum": 0, "exclusive_maximum": VOCAB}),
                    "min_items": 1,
                    "max_items": MAX_LEN,
                },
            ),
            "n_tok": ("integer", {"minimum": 1, "maximum": MAX_LEN}),
            "source": ("string", {"enum": list(SOURCES)}),
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
    },
)


def sequences_schema():
    return compile_schema(SEQUENCES_SCHEMA_SRC)


def n_tok_invariant() -> TableCheck:
    """Cross-field invariant ``n_tok == len(tokens)`` — the custom
    ``validator`` hook of SURVEY.md §2.1 #35 as a vectorized TableCheck."""

    def fn(tbl: pa.Table) -> np.ndarray:
        if "n_tok" not in tbl.column_names or "tokens" not in tbl.column_names:
            return np.ones(tbl.num_rows, dtype=bool)
        ok = pc.equal(pc.list_value_length(tbl["tokens"]), pc.cast(tbl["n_tok"], pa.int32()))
        filled = pc.fill_null(ok, True)  # null cells handled by `required`
        arr = filled.combine_chunks() if isinstance(filled, pa.ChunkedArray) else filled
        return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)

    return TableCheck(
        keyword="validator",
        fn=fn,
        path="/n_tok",
        message="n_tok != len(tokens)",
    )


def validate_corpus(
    paths: Any,
    fail: str = "all",
    batch_size: Optional[int] = 8192,
    concurrency: Any = (1, 16),
    keep_details: bool = True,
) -> ValidationResult:
    """Validate the sequences corpus at ``paths`` (file list or directory)."""
    import ray.data as rd

    ds = rd.read_parquet(paths)
    return validate_dataset(
        ds,
        sequences_schema(),
        fail=fail,
        id_col="doc_id",
        table_checks=[n_tok_invariant()],
        keep_details=keep_details,
        batch_size=batch_size,
        concurrency=concurrency,
        extra_cols=("source",),
    )
