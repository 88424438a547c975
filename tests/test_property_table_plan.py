"""Whole-table-plan property test: random map schemas (properties +
required + dependencies + size bounds + combinators) over random tables
must give the same per-row verdict as the scalar validator on the row
dicts (nulls stripped = property absent)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import compile_schema

col_schema = st.one_of(
    st.just("integer"),
    st.just("string"),
    st.builds(lambda kw: ("integer", kw), st.fixed_dictionaries({}, optional={
        "minimum": st.integers(-5, 5), "maximum": st.integers(-5, 5),
        "enum": st.lists(st.integers(-5, 5), min_size=1, max_size=3),
    })),
    st.builds(lambda kw: ("string", kw), st.fixed_dictionaries({}, optional={
        "min_length": st.integers(0, 3), "pattern": st.sampled_from(["^a", "b$"]),
    })),
    st.just({"one_of": [("integer", {"minimum": 2}), ("integer", {"maximum": 0})]}),
)

root_extras = st.fixed_dictionaries({}, optional={
    "required": st.lists(st.sampled_from(["c0", "c1", "c2"]), min_size=1,
                         max_size=3, unique=True),
    "dependencies": st.dictionaries(
        st.sampled_from(["c0", "c1"]),
        st.lists(st.sampled_from(["c1", "c2"]), min_size=1, max_size=2,
                 unique=True),
        min_size=1, max_size=2),
    "min_properties": st.integers(0, 3),
    "max_properties": st.integers(1, 4),
    "additional_properties": st.just(False),
})

int_col = st.lists(st.one_of(st.integers(-6, 6), st.none()), min_size=1, max_size=8)
str_col = st.lists(st.one_of(st.sampled_from(["", "a", "ab", "b"]), st.none()),
                   min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(s0=col_schema, s1=col_schema, extras=root_extras,
       v_int=int_col, v_str=str_col)
def test_table_plan_matches_scalar(s0, s1, extras, v_int, v_str):
    n = min(len(v_int), len(v_str))
    schema_src = ("map", {
        "properties": {"c0": s0, "c1": s1, "c2": "integer"},
        **extras,
    })
    schema = compile_schema(schema_src)
    tbl = pa.table({
        "c0": pa.array(v_int[:n], type=pa.int64()),
        "c1": pa.array(v_str[:n], type=pa.string()),
        "c2": pa.array(v_int[:n], type=pa.int64()),
    })
    plan = compile_table_plan(schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    rows = tbl.to_pylist()
    for i, row in enumerate(rows):
        row = {k: v for k, v in row.items() if v is not None}
        assert bool(valid[i]) == is_valid(schema, row), (schema_src, row)
