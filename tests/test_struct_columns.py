"""Recursive validation of STRUCT-typed columns (nested Parquet schemas):
the struct's fields form a sub-table validated with a nested TablePlan;
parent-null rows count as property-absent; violation paths nest."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import compile_schema

NESTED_SCHEMA = ("map", {"properties": {
    "meta": ("map", {
        "properties": {
            "lang": ("string", {"enum": ["en", "de"]}),
            "score": ("number", {"minimum": 0, "maximum": 1}),
            "inner": ("map", {"properties": {"k": ("integer", {"minimum": 0})},
                              "required": ["k"]}),
        },
        "required": ["lang"],
    }),
}})


def _strip(v):
    if isinstance(v, dict):
        return {k: _strip(x) for k, x in v.items() if x is not None}
    return v


def test_nested_struct_plan():
    schema = compile_schema(NESTED_SCHEMA)
    rows = [
        {"meta": {"lang": "en", "score": 0.5, "inner": {"k": 1}}},
        {"meta": {"lang": "xx", "score": 0.5, "inner": {"k": 1}}},
        {"meta": {"lang": "en", "score": 2.0, "inner": {"k": 1}}},
        {"meta": {"lang": None, "score": 0.5, "inner": {"k": 1}}},
        {"meta": {"lang": "de", "score": 0.5, "inner": {"k": -1}}},
        {"meta": {"lang": "de", "score": 0.5, "inner": None}},
        {"meta": None},
    ]
    tbl = pa.Table.from_pylist(rows)
    plan = compile_table_plan(schema, tbl.schema)
    # struct column handled by ONE recursive check, no fallback
    assert plan.column_plans[0].fallback_node is None
    valid, viols = evaluate_batch(plan, tbl)
    assert list(valid) == [True, False, False, False, False, True, True]
    got = {(v.keyword, p) for v in viols
           for p in (v.paths if isinstance(v.paths, np.ndarray) else [v.paths])}
    assert ("minimum", "/meta/inner/k") in got
    assert ("required", "/meta/lang") in got
    for i, r in enumerate(rows):
        assert bool(valid[i]) == is_valid(schema, _strip(r))


lang_vals = st.one_of(st.sampled_from(["en", "de", "xx"]), st.none())
score_vals = st.one_of(st.floats(-1, 2, allow_nan=False).map(lambda f: round(f, 2)),
                       st.none())
k_vals = st.one_of(st.integers(-3, 3), st.none())


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(st.one_of(
    st.none(),
    st.fixed_dictionaries({"lang": lang_vals, "score": score_vals,
                           "inner": st.one_of(st.none(),
                                              st.fixed_dictionaries({"k": k_vals}))})),
    min_size=1, max_size=10))
def test_struct_property(rows):
    schema = compile_schema(NESTED_SCHEMA)
    data = [{"meta": r} for r in rows]
    tbl = pa.Table.from_pylist(data)
    if not pa.types.is_struct(tbl.schema.field("meta").type):
        return  # all-null column → no struct type info
    plan = compile_table_plan(schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    for i, d in enumerate(data):
        assert bool(valid[i]) == is_valid(schema, _strip(d)), d
