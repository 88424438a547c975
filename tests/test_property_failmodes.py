"""Property differential (r3): the vector layer's violation SETS equal the
scalar path's in every reference fail mode, on randomized schemas and
tables — the generalization of the hand-built cases in test_kernels.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
from xema_ray.functions.scalar import validate_value
from xema_ray.schema.builder import compile_schema

_INT_KW = st.fixed_dictionaries({}, optional={
    "minimum": st.integers(-5, 5),
    "maximum": st.integers(-5, 5),
    "multiple_of": st.integers(1, 4),
    "enum": st.lists(st.integers(-3, 3), min_size=1, max_size=4),
})
_STR_KW = st.fixed_dictionaries({}, optional={
    "min_length": st.integers(0, 4),
    "max_length": st.integers(0, 6),
    "pattern": st.sampled_from(["^a", "b$", "^[ab]+$"]),
})
_LIST_KW = st.fixed_dictionaries({}, optional={
    "min_items": st.integers(0, 3),
    "max_items": st.integers(0, 4),
    "unique_items": st.just(True),
    "items": st.builds(lambda kw: ("integer", kw), _INT_KW),
})


@st.composite
def schema_and_table(draw):
    cols = {}
    arrays = {}
    n = draw(st.integers(1, 6))
    for name, kind in [("i", "int"), ("s", "str"), ("l", "list")]:
        if not draw(st.booleans()):
            continue
        if kind == "int":
            base = ("integer", draw(_INT_KW))
            # sometimes wrap in a combinator — exercises the default-group
            # chain ranks in the trims
            wrap = draw(st.sampled_from(["none", "one_of", "any_of", "not"]))
            if wrap == "one_of":
                base = {"one_of": [base, ("integer", {"maximum": -4})]}
            elif wrap == "any_of":
                base = {"any_of": [base, ("integer", {"minimum": 6})]}
            elif wrap == "not":
                base = {"not": ("integer", draw(_INT_KW))}
            cols[name] = base
            arrays[name] = pa.array(
                draw(st.lists(st.one_of(st.none(), st.integers(-6, 6)),
                              min_size=n, max_size=n)), type=pa.int64())
        elif kind == "str":
            cols[name] = ("string", draw(_STR_KW))
            arrays[name] = pa.array(
                draw(st.lists(st.one_of(st.none(),
                                        st.sampled_from(["", "a", "ab", "abc",
                                                         "ba", "aaaa", "zzz"])),
                              min_size=n, max_size=n)), type=pa.string())
        else:
            cols[name] = ("list", draw(_LIST_KW))
            arrays[name] = pa.array(
                draw(st.lists(st.one_of(
                    st.none(),
                    st.lists(st.integers(-6, 6), max_size=4)),
                    min_size=n, max_size=n)), type=pa.list_(pa.int64()))
    if not cols:
        cols["i"] = ("integer", {"minimum": 0})
        arrays["i"] = pa.array([draw(st.integers(-3, 3))
                                for _ in range(n)], type=pa.int64())
    spec = {"properties": cols}
    if draw(st.booleans()):
        spec["required"] = draw(st.lists(st.sampled_from(sorted(cols)),
                                         unique=True, max_size=len(cols)))
    if draw(st.booleans()):
        spec["dependencies"] = {
            draw(st.sampled_from(sorted(cols))):
                [draw(st.sampled_from(sorted(cols)))]}
    return ("map", spec), pa.table(arrays)


@settings(max_examples=60, deadline=None)
@given(case=schema_and_table())
@pytest.mark.parametrize("mode", ["early", "finally", "immediately"])
def test_vector_violation_sets_match_scalar(case, mode):
    src, tbl = case
    schema = compile_schema(src)
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl, fail=mode)
    got = {}
    for cv in viols:
        for j, r in enumerate(cv.row_idx.tolist()):
            p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
            got.setdefault(r, set()).add((p, cv.keyword))
    rows = tbl.to_pylist()
    for i, row in enumerate(rows):
        row = {k: v for k, v in row.items() if v is not None}
        sv = validate_value(schema, row, fail=mode)
        want = {(v.path or "/", v.keyword) for v in sv}
        assert valid[i] == (not want), (i, row, want)
        if mode == "immediately":
            # one violation per invalid row; it must be a scalar-legal one
            assert len(got.get(i, set())) == (1 if want else 0), (i, row)
        else:
            assert got.get(i, set()) == want, (mode, i, row,
                                               got.get(i), want)


_FIELD_KW = st.fixed_dictionaries({}, optional={
    "minimum": st.integers(-3, 3),
})


@st.composite
def struct_schema_and_table(draw):
    n = draw(st.integers(1, 5))
    inner_req = draw(st.booleans())
    spec = ("map", {"properties": {
        "o": ("map", {
            "properties": {"a": ("integer", draw(_FIELD_KW)),
                           "b": ("string", draw(_STR_KW))},
            **({"required": ["a"]} if inner_req else {}),
        }),
        "i": ("integer", draw(_INT_KW)),
    }})
    structs = draw(st.lists(st.one_of(
        st.none(),
        st.fixed_dictionaries({
            "a": st.one_of(st.none(), st.integers(-5, 5)),
            "b": st.one_of(st.none(),
                           st.sampled_from(["", "a", "ab", "zzz"])),
        })), min_size=n, max_size=n))
    tbl = pa.table({
        "o": pa.array(structs, type=pa.struct([("a", pa.int64()),
                                               ("b", pa.string())])),
        "i": pa.array(draw(st.lists(
            st.one_of(st.none(), st.integers(-5, 5)),
            min_size=n, max_size=n)), type=pa.int64()),
    })
    return spec, tbl


@settings(max_examples=50, deadline=None)
@given(case=struct_schema_and_table())
@pytest.mark.parametrize("mode", ["early", "finally"])
def test_struct_interior_violation_sets_match_scalar(case, mode):
    """Struct-column interiors inherit the caller's fail mode (r3) — the
    nested sub-plan's trimmed sets must equal the scalar recursion's."""
    src, tbl = case
    schema = compile_schema(src)
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl, fail=mode)
    got = {}
    for cv in viols:
        for j, r in enumerate(cv.row_idx.tolist()):
            p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
            got.setdefault(r, set()).add((p, cv.keyword))
    for i, row in enumerate(tbl.to_pylist()):
        row = {k: v for k, v in row.items() if v is not None}
        # struct interior: null FIELD = absent key (Arrow cannot
        # distinguish) — normalize the scalar's view the same way
        if "o" in row:
            row["o"] = {k: v for k, v in row["o"].items() if v is not None}
        sv = validate_value(schema, row, fail=mode)
        want = {(v.path or "/", v.keyword) for v in sv}
        assert valid[i] == (not want), (i, row, want)
        assert got.get(i, set()) == want, (mode, i, row, got.get(i), want)
