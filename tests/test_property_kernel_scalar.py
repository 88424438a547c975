"""Property-based agreement: for random column schemas and random Arrow
columns (with nulls and edge values), the vectorized kernel verdict must
equal the scalar validator's verdict on every row."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import compile_schema

int_kw = st.fixed_dictionaries({}, optional={
    "minimum": st.integers(-10, 10),
    "maximum": st.integers(-10, 10),
    "exclusive_minimum": st.integers(-10, 10),
    "exclusive_maximum": st.integers(-10, 10),
    "multiple_of": st.integers(1, 5),
    "enum": st.lists(st.integers(-10, 10), min_size=1, max_size=5),
    "const": st.integers(-10, 10),
})

str_kw = st.fixed_dictionaries({}, optional={
    "min_length": st.integers(0, 6),
    "max_length": st.integers(0, 8),
    "pattern": st.sampled_from(["^a", "b$", "a+b", "^[a-c]*$"]),
    "enum": st.lists(st.sampled_from(["a", "ab", "abc", "b", "zzz"]),
                     min_size=1, max_size=4),
})

list_kw = st.fixed_dictionaries({}, optional={
    "min_items": st.integers(0, 4),
    "max_items": st.integers(0, 6),
    "unique_items": st.just(True),
    "items": st.builds(lambda kw: ("integer", kw), int_kw),
    "contains": st.builds(lambda kw: ("integer", kw), int_kw),
})

int_vals = st.lists(
    st.one_of(st.integers(-12, 12), st.none()), min_size=1, max_size=20)
str_vals = st.lists(
    st.one_of(st.sampled_from(["", "a", "ab", "abc", "abcd", "b", "zzz", "aab"]),
              st.none()),
    min_size=1, max_size=20)
list_vals = st.lists(
    st.one_of(st.lists(st.integers(-12, 12), max_size=6), st.none()),
    min_size=1, max_size=15)


def _check(src, arr):
    table_schema = compile_schema(("map", {"properties": {"x": src}}))
    col_schema = compile_schema(src)
    tbl = pa.table({"x": arr})
    plan = compile_table_plan(table_schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    for i, v in enumerate(arr.to_pylist()):
        expected = True if v is None else is_valid(col_schema, v)
        assert bool(valid[i]) == expected, (src, v)


@settings(max_examples=150, deadline=None)
@given(kw=int_kw, vals=int_vals)
def test_integer_columns(kw, vals):
    _check(("integer", kw), pa.array(vals, type=pa.int64()))


@settings(max_examples=150, deadline=None)
@given(kw=str_kw, vals=str_vals)
def test_string_columns(kw, vals):
    _check(("string", kw), pa.array(vals, type=pa.string()))


@settings(max_examples=100, deadline=None)
@given(kw=list_kw, vals=list_vals)
def test_list_columns(kw, vals):
    _check(("list", kw), pa.array(vals, type=pa.list_(pa.int32())))


list_vals_with_null_elems = st.lists(
    st.one_of(st.lists(st.one_of(st.integers(-12, 12), st.none()), max_size=6),
              st.none()),
    min_size=1, max_size=15)


@settings(max_examples=100, deadline=None)
@given(kw=list_kw, vals=list_vals_with_null_elems)
def test_list_columns_with_null_elements(kw, vals):
    """NULL elements inside lists: fail typed items/contains, count as
    equal for unique_items — pinned against the scalar validator."""
    _check(("list", kw), pa.array(vals, type=pa.list_(pa.int32())))


@settings(max_examples=75, deadline=None)
@given(kw=int_kw, vals=st.lists(
    st.one_of(st.floats(-12, 12, allow_nan=False).map(lambda f: round(f, 2)),
              st.integers(-12, 12).map(float), st.none()),
    min_size=1, max_size=15))
def test_float_columns_as_integer_schema(kw, vals):
    # like-integer semantics over a float column
    _check(("integer", kw), pa.array(vals, type=pa.float64()))
