"""Vectorized kernels must agree with the scalar validator (the semantics
ground truth) row by row, on tables including nulls and edge values."""

import numpy as np
import pyarrow as pa
import pytest

from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
from xema_ray.functions.scalar import is_valid, validate_value
from xema_ray.schema.builder import compile_schema

# (schema keywords for column "x", pa array)
COLUMN_CASES = [
    (("integer", {"minimum": 0}), pa.array([1, -1, 0, None], type=pa.int64())),
    (("integer", {"minimum": 0, "exclusive_minimum": True}), pa.array([0, 1, None])),
    (("number", {"exclusive_maximum": 10}), pa.array([9.5, 10.0, 10.5, None])),
    (("integer", {}), pa.array([1.0, 1.5, None], type=pa.float64())),  # like-integer
    (("integer", {"multiple_of": 3}), pa.array([9, 10, 0, -3, None])),
    (("number", {"multiple_of": 0.0001}), pa.array([0.0075, 0.00751, None])),
    (("string", {"min_length": 2, "max_length": 3}), pa.array(["a", "ab", "abc", "abcd", None])),
    (("string", {"pattern": "^a+$"}), pa.array(["aaa", "aab", "", None])),
    (("string", {"enum": ["web", "books"]}), pa.array(["web", "bad", None])),
    (("string", {"const": "web"}), pa.array(["web", "bad", None])),
    (("integer", {"const": 5}), pa.array([5, 6, None])),
    (("integer", {"enum": [1, 2, 3]}), pa.array([1, 4, None])),
    (("string", {"format": "ipv4"}), pa.array(["1.2.3.4", "256.1.1.1", "x", None])),
    (("string", {"format": "date"}), pa.array(["2021-01-31", "2021-02-30", "nope", None])),
    (("string", {"format": "email"}), pa.array(["a@b.de", "a.b.de", None])),
    (("string", {"format": "hostname"}), pa.array(["example.com", "-bad.com", "bad-.com", None])),
    (("list", {"min_items": 2, "max_items": 3}), pa.array([[1], [1, 2], [1, 2, 3, 4], None])),
    (("list", {"unique_items": True}), pa.array([[1, 2], [1, 1], [], None])),
    (("list", {"items": ("integer", {"minimum": 0, "exclusive_maximum": 10})}),
     pa.array([[1, 2], [-1, 3], [11], [], None])),
    (("list", {"contains": ("integer", {"minimum": 5})}),
     pa.array([[1, 6], [1, 2], [], None])),
    (("list", {"items": ("integer", {"enum": [1, 2]})}), pa.array([[1, 2], [3]])),
    (("list", {"unique_items": True}), pa.array([[None, None], [None, 1], [0, None]],
                                                type=pa.list_(pa.int32()))),
    # ADVICE r1: null elements in non-numeric lists crashed the kernel
    (("list", {"unique_items": True}),
     pa.array([["a", None, None], ["a", "b"], [None, "x"], ["a", "a"], None],
              type=pa.list_(pa.string()))),
    (("list", {"unique_items": True}),
     pa.array([[True, None, None], [True, False], [], [False, False]],
              type=pa.list_(pa.bool_()))),
    (("list", {"items": ("integer", {"minimum": 0})}),
     pa.array([[1, None], [2], [None]], type=pa.list_(pa.int32()))),
    (("list", {"items": [("integer", {"minimum": 0}), "string"],
               "additional_items": False}),
     pa.array([[0], [0, 1], [0, 1, 2], [-1], [], None], type=pa.list_(pa.int32()))),
    (("list", {"items": ["integer"], "additional_items": ("integer", {"maximum": 5})}),
     pa.array([[1, 2], [1, 9], []], type=pa.list_(pa.int32()))),
    (("list", {"contains": False}), pa.array([[1], [], None])),
    (("list", {"contains": True}), pa.array([[1], [], None])),
    (False, pa.array([1, None])),
    (True, pa.array([1, None])),
]


@pytest.mark.parametrize("src,arr", COLUMN_CASES, ids=[str(c[0]) for c in COLUMN_CASES])
def test_kernel_matches_scalar(src, arr):
    table_schema = compile_schema(("map", {"properties": {"x": src}}))
    col_schema = compile_schema(src)
    tbl = pa.table({"x": arr})
    plan = compile_table_plan(table_schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    for i, v in enumerate(arr.to_pylist()):
        expected = True if v is None else is_valid(col_schema, v)
        assert valid[i] == expected, (
            f"row {i}={v!r}: kernel={valid[i]} scalar={expected} "
            f"{validate_value(col_schema, v) if v is not None else ''}"
        )


def test_required_and_missing_column():
    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "required": ["a", "b"],
    }))
    tbl = pa.table({"a": pa.array([1, None, 3])})
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl)
    assert not valid.any()  # column b missing entirely
    kws = {v.keyword for v in viols}
    assert kws == {"required"}


def test_additional_properties_false():
    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "additional_properties": False,
    }))
    tbl = pa.table({"a": [1], "b": [2]})
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl)
    assert not valid.any()
    assert any(v.keyword == "additional_properties" for v in viols)


def test_additional_properties_schema_applies_to_extra_columns():
    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "additional_properties": ("integer", {"minimum": 0}),
    }))
    tbl = pa.table({"a": [1, 1], "b": [2, -2]})
    plan = compile_table_plan(schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    assert list(valid) == [True, False]


def test_pattern_properties_select_columns():
    schema = compile_schema(("map", {
        "pattern_properties": {"^n_": ("integer", {"minimum": 0})},
    }))
    tbl = pa.table({"n_tok": [1, -1], "other": ["x", "y"]})
    plan = compile_table_plan(schema, tbl.schema)
    valid, _ = evaluate_batch(plan, tbl)
    assert list(valid) == [True, False]


def test_property_names_over_column_names():
    schema = compile_schema(("map", {
        "property_names": ("string", {"pattern": "^[a-z_]+$"}),
    }))
    good = pa.table({"abc": [1]})
    bad = pa.table({"Bad": [1]})
    assert evaluate_batch(compile_table_plan(schema, good.schema), good)[0].all()
    assert not evaluate_batch(compile_table_plan(schema, bad.schema), bad)[0].any()


def test_vectorized_column_combinator():
    # flat combinators vectorize via mask algebra (SURVEY §2.1 #28-32)
    schema = compile_schema(("map", {"properties": {
        "x": {"one_of": [("integer", {"minimum": 2}), ("integer", {"maximum": 0})]},
    }}))
    tbl = pa.table({"x": [3, 1, -1, None]})
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.column_plans[0].fallback_node is None
    assert [c.keyword for c in plan.column_plans[0].checks] == ["one_of"]
    valid, viols = evaluate_batch(plan, tbl)
    assert list(valid) == [True, False, True, True]
    assert viols[0].keyword == "one_of"


def test_nested_combinators_vectorize():
    # r2: depth-2 combinators run on the kernel path (recursive mask
    # algebra), with verdicts identical to the scalar ground truth
    schema = compile_schema(("map", {"properties": {
        "x": {"one_of": [{"not": ("integer", {"minimum": 2})}, "string"]},
    }}))
    tbl = pa.table({"x": [1, 3, None]})
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.column_plans[0].fallback_node is None  # vectorized now
    valid, _ = evaluate_batch(plan, tbl)
    assert list(valid) == [True, False, True]


def test_deep_combinators_vectorize():
    """r3 (VERDICT item 6): the depth-3 gate is lifted — arbitrarily
    nested combinators run on the kernel path with scalar-exact verdicts."""
    deep = {"any_of": [{"one_of": [{"not": {"all_of": [
        {"any_of": [("integer", {"minimum": 5})]}]}}]}]}
    schema = compile_schema(("map", {"properties": {"x": deep}}))
    tbl = pa.table({"x": [1, 5, 7, None]})
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.column_plans[0].fallback_node is None  # vectorized now
    valid, _ = evaluate_batch(plan, tbl)
    col_schema = compile_schema(deep)
    for i, v in enumerate(tbl["x"].to_pylist()):
        expected = True if v is None else is_valid(col_schema, v)
        assert valid[i] == expected, (i, v)


def test_immediately_mode_keeps_per_row_verdicts():
    """fail='immediately' trims violations to one per row but NEVER
    changes another row's verdict (behaviour.ex:36: modes affect
    completeness, not the validity result)."""
    schema = compile_schema(("map", {"properties": {
        "a": ("integer", {"minimum": 0}),
        "b": ("string", {"min_length": 2}),
    }}))
    tbl = pa.table({"a": [-1, 5, -2], "b": ["x", "q", "ok"]})
    plan = compile_table_plan(schema, tbl.schema)
    v_imm, viols_imm = evaluate_batch(plan, tbl, fail="immediately")
    v_early, viols_early = evaluate_batch(plan, tbl, fail="early")
    assert list(v_imm) == list(v_early) == [False, False, False]
    per_row_imm = {}
    for cv in viols_imm:
        for r in cv.row_idx:
            per_row_imm[int(r)] = per_row_imm.get(int(r), 0) + 1
    assert per_row_imm == {0: 1, 1: 1, 2: 1}
    n_early = sum(len(cv.row_idx) for cv in viols_early)
    assert n_early == 4  # row0: a+b, row1: b, row2: a


def test_segment_reduce_edge_cases():
    """reduceat quirks: trailing/mid-stream empty rows, empty values."""
    from xema_ray.functions.kernels import _segment_all, _segment_any

    cases = [
        (np.array([True, False]), np.array([0, 2, 2]), [False, True], [True, False]),
        (np.array([True, False]), np.array([0, 0, 2]), [True, False], [False, True]),
        (np.array([], dtype=bool), np.array([0, 0, 0]), [True, True], [False, False]),
        (np.array([True] * 3), np.array([0, 1, 1, 3]), [True, True, True], [True, False, True]),
        (np.array([False, True, False]), np.array([0, 3]), [False], [True]),
    ]
    for ok, off, want_all, want_any in cases:
        assert list(_segment_all(ok, off)) == want_all
        assert list(_segment_any(ok, off)) == want_any


def test_violation_paths_and_rows():
    schema = compile_schema(("map", {"properties": {
        "tokens": ("list", {"items": ("integer", {"minimum": 0})}),
    }}))
    tbl = pa.table({"tokens": [[0, -1, 2], [5], [-7]]})
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl)
    assert list(valid) == [False, True, False]
    got = [(int(r), p) for v in viols for r, p in zip(v.row_idx, np.atleast_1d(v.paths))]
    assert sorted(got) == [(0, "/tokens/1"), (2, "/tokens/0")]
    assert all(v.keyword == "minimum" for v in viols)


def test_list_of_struct_vectorized():
    """r2: list<struct> columns run on the kernel path — element structs
    validate as a nested sub-table; verdicts and violation paths match the
    scalar ground truth."""
    schema = compile_schema(("map", {"properties": {
        "evs": ("list", {"min_items": 1, "items": ("map", {
            "properties": {"kind": ("string", {"min_length": 2}),
                           "n": ("integer", {"minimum": 0})},
            "required": ["kind"],
        })}),
    }}))
    t = pa.table({"evs": pa.array(
        [
            [{"kind": "ok", "n": 1}, {"kind": "x", "n": 2}],   # elem 1 short kind
            [{"kind": "good", "n": -5}],                       # n below minimum
            [],                                                # min_items
            [{"kind": "fine", "n": 3}],
            None,                                              # null column cell
        ],
        type=pa.list_(pa.struct([("kind", pa.string()), ("n", pa.int64())])),
    )})
    plan = compile_table_plan(schema, t.schema)
    assert plan.column_plans[0].fallback_node is None  # vectorized
    valid, viols = evaluate_batch(plan, t, fail="finally")
    col_schema = compile_schema(("list", {"min_items": 1, "items": ("map", {
        "properties": {"kind": ("string", {"min_length": 2}),
                       "n": ("integer", {"minimum": 0})},
        "required": ["kind"],
    })}))
    for i, v in enumerate(t["evs"].to_pylist()):
        expected = True if v is None else is_valid(col_schema, v)
        assert valid[i] == expected, f"row {i}"
    paths = sorted(p for cv in viols
                   for p in (cv.paths.tolist() if hasattr(cv.paths, "tolist")
                             else [cv.paths] * len(cv.row_idx)))
    assert "/evs/1/kind" in paths and "/evs/0/n" in paths and "/evs" in paths


def test_fail_early_vector_matches_scalar():
    """r2 (VERDICT item 6): the vector layer's fail='early' collection now
    matches the reference per-level first-failing-group semantics, checked
    against the scalar validator on an opt_fail-style schema."""
    schema = compile_schema(("map", {
        "properties": {"foo": "integer", "bar": "integer",
                       "str_a": ("string", {"min_length": 2, "pattern": "^a"})},
        "max_properties": 3,
        "additional_properties": False,
    }))
    tbl = pa.table({
        "foo": pa.array([5, None, 1, 1], type=pa.int64()),
        "bar": pa.array([2, None, 2, 2], type=pa.int64()),
        "str_a": ["ab", "ab", "b", "ab"],
        "zz": pa.array([1, None, None, None], type=pa.int64()),
    })
    # the scalar ground truth sees each row as a dict (null = absent key)
    rows = [
        {"foo": 5, "bar": 2, "str_a": "ab", "zz": 1},  # 4 props + additional
        {"str_a": "ab", "zz": None},                    # valid w/ absent keys
        {"foo": 1, "bar": 2, "str_a": "b"},             # min_length + pattern
        {"foo": 1, "bar": 2, "str_a": "ab"},            # valid
    ]
    rows[1] = {"str_a": "ab"}
    plan = compile_table_plan(schema, tbl.schema)
    for mode in ("early", "finally"):
        valid, viols = evaluate_batch(plan, tbl, fail=mode)
        got = {}
        for cv in viols:
            for j, r in enumerate(cv.row_idx.tolist()):
                p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
                got.setdefault(r, set()).add((p, cv.keyword))
        for i, row in enumerate(rows):
            sv = validate_value(schema, row, fail=mode)
            want = {(v.path or "/", v.keyword) for v in sv}
            # r3: reference-exact in BOTH modes (finally now applies the
            # reference collect/with-chain shape, no longer a superset)
            assert got.get(i, set()) == want, (mode, i, got.get(i), want)
    # immediately: exactly one violation per invalid row, none for valid
    valid, viols = evaluate_batch(plan, tbl, fail="immediately")
    per_row = {}
    for cv in viols:
        for r in cv.row_idx.tolist():
            per_row[r] = per_row.get(r, 0) + 1
    assert set(per_row) == {0, 2} and all(v == 1 for v in per_row.values())


def _viol_sets(viols):
    got = {}
    for cv in viols:
        for j, r in enumerate(cv.row_idx.tolist()):
            p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
            got.setdefault(r, set()).add((p, cv.keyword))
    return got


def test_fail_modes_vector_matches_scalar_nested():
    """r3 (VERDICT item 5): vector violation SETS are byte-equal to the
    scalar path in all three reference fail modes, including struct-column
    interiors and list chains (scalar chains first-fail-only under
    :finally; list/map chains collect)."""
    schema = compile_schema(("map", {
        "properties": {
            "s": ("string", {"min_length": 3, "pattern": "^a",
                             "max_length": 5}),
            "nums": ("list", {"min_items": 2, "unique_items": True,
                              "items": ("integer", {"minimum": 0})}),
            "obj": ("map", {"properties": {
                        "name": ("string", {"min_length": 2, "pattern": "^x"}),
                        "count": ("integer", {"minimum": 1}),
                    },
                    "required": ["name"]}),
        },
    }))
    tbl = pa.table({
        # row0: s fails min_length AND pattern (scalar chain: first only
        #        under finally); row1 valid; row2 fails max_length only
        "s": pa.array(["b", "abc", "aaaaaaa"], type=pa.string()),
        # row0: min_items AND unique AND items all fail -> list collect
        "nums": pa.array([[-1, -1], [0, 1], [2, 3]],
                         type=pa.list_(pa.int64())),
        # row0: interior name fails min_length AND pattern (scalar chain
        #        inside the struct) + count below minimum (sibling collect)
        "obj": pa.array(
            [{"name": "b", "count": 0}, {"name": "xy", "count": 2},
             {"name": "xz", "count": 1}],
            type=pa.struct([("name", pa.string()), ("count", pa.int64())])),
    })
    rows = [
        {"s": "b", "nums": [-1, -1], "obj": {"name": "b", "count": 0}},
        {"s": "abc", "nums": [0, 1], "obj": {"name": "xy", "count": 2}},
        {"s": "aaaaaaa", "nums": [2, 3], "obj": {"name": "xz", "count": 1}},
    ]
    plan = compile_table_plan(schema, tbl.schema)
    assert all(cp.fallback_node is None for cp in plan.column_plans)
    for mode in ("early", "finally"):
        valid, viols = evaluate_batch(plan, tbl, fail=mode)
        got = _viol_sets(viols)
        for i, row in enumerate(rows):
            sv = validate_value(schema, row, fail=mode)
            want = {(v.path or "/", v.keyword) for v in sv}
            assert got.get(i, set()) == want, (mode, i, got.get(i), want)
            assert valid[i] == (not want)
    # immediately: one violation per invalid row
    _, viols = evaluate_batch(plan, tbl, fail="immediately")
    per_row = {}
    for cv in viols:
        for r in cv.row_idx.tolist():
            per_row[r] = per_row.get(r, 0) + 1
    assert set(per_row) == {0, 2} and all(v == 1 for v in per_row.values())


def test_fail_all_mode_collects_everything():
    """Engine-extension fail='all': complete per-keyword collection (the
    corpus-QA report mode, flagship default) — a strict superset of
    :finally on scalar multi-keyword chains."""
    schema = compile_schema(("map", {"properties": {
        "s": ("string", {"min_length": 3, "pattern": "^a"})}}))
    tbl = pa.table({"s": pa.array(["b"], type=pa.string())})
    plan = compile_table_plan(schema, tbl.schema)
    _, viols_all = evaluate_batch(plan, tbl, fail="all")
    _, viols_fin = evaluate_batch(plan, tbl, fail="finally")
    kw_all = {cv.keyword for cv in viols_all}
    kw_fin = {cv.keyword for cv in viols_fin}
    assert kw_all == {"min_length", "pattern"}
    assert kw_fin == {"min_length"}  # reference with-chain stops


def test_schema_form_dependencies_vectorized():
    """r3 (VERDICT item 6): schema-form dependencies compile to a
    vectorized sub-plan check (present(key) => row validates dep schema)
    instead of the per-row dict fallback; verdicts match the scalar path."""
    schema = compile_schema(("map", {
        "properties": {"a": "integer", "b": "string"},
        "dependencies": {"a": ("map", {"required": ["b"]})},
    }))
    tbl = pa.table({
        "a": pa.array([1, None, 2], type=pa.int64()),
        "b": pa.array(["x", None, None], type=pa.string()),
    })
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.root_fallback is None  # no dict fallback
    assert any(tc.keyword == "dependencies" for tc in plan.root_checks)
    valid, viols = evaluate_batch(plan, tbl)
    rows = [{"a": 1, "b": "x"}, {}, {"a": 2}]
    for i, row in enumerate(rows):
        assert valid[i] == is_valid(schema, row), (i, row)
    assert list(valid) == [True, True, False]
    kws = {cv.keyword for cv in viols}
    assert kws == {"dependencies"}


def test_schema_form_dependencies_nonmap_dep_falls_back():
    # a non-map dependency schema (rare) keeps the exact dict fallback
    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "dependencies": {"a": ("map", {"validator": lambda v: True})},
    }))
    tbl = pa.table({"a": [1]})
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.root_fallback is not None


def test_root_combinator_suppresses_map_group_all_modes():
    """Reference do_validate chain: a failing root DEFAULT-group keyword
    (enum) runs before the map group, so column violations must NOT
    surface in ANY mode — vector matches scalar exactly."""
    schema = compile_schema(("map", {
        "properties": {"a": ("integer", {"minimum": 10})},
        "enum": [{"a": 99}],
    }))
    tbl = pa.table({"a": pa.array([1], type=pa.int64())})
    plan = compile_table_plan(schema, tbl.schema)
    for mode in ("early", "finally", "immediately"):
        _, viols = evaluate_batch(plan, tbl, fail=mode)
        got = sorted({cv.keyword for cv in viols})
        want = sorted({v.keyword
                       for v in validate_value(schema, {"a": 1}, fail=mode)})
        assert got == want == ["enum"], (mode, got, want)


def test_root_map_group_collects_under_finally():
    """dependencies (map group) + a column failure collect TOGETHER under
    :finally but chain under :early — both matching the scalar path."""
    schema = compile_schema(("map", {
        "properties": {"a": ("integer", {"minimum": 10}), "b": "integer"},
        "dependencies": {"a": ["b"]},
    }))
    tbl = pa.table({"a": pa.array([1], type=pa.int64()),
                    "b": pa.array([None], type=pa.int64())})
    plan = compile_table_plan(schema, tbl.schema)
    for mode, want in (("early", ["dependencies"]),
                       ("finally", ["dependencies", "minimum"])):
        _, viols = evaluate_batch(plan, tbl, fail=mode)
        got = sorted({cv.keyword for cv in viols})
        sv = sorted({v.keyword
                     for v in validate_value(schema, {"a": 1}, fail=mode)})
        assert got == sv == want, (mode, got, sv)


def test_list_const_enum_vectorized_matches_scalar():
    """r4: const/enum over LIST columns run pure-vector
    (_list_const_mask) and agree with the scalar validator on strict
    structural === — numeric cross-eq, bool/int distinction, null
    elements, empty lists, impossible member types."""
    rows = [[1, 2], [1], [], [0], [2, 2], None]
    tbl = pa.table({"x": pa.array(rows, type=pa.list_(pa.int32()))})
    for schema_src in (
        ("list", {"const": [1, 2]}),
        ("list", {"const": []}),
        ("list", {"const": [0]}),
        ("list", {"const": [1.0, 2.0]}),   # numeric cross-eq: matches [1,2]
        ("list", {"const": [True]}),       # bool member never equals int 1
        ("list", {"const": [1.5]}),        # non-integral float: impossible
        ("list", {"const": 0}),            # non-list const: impossible
        ("list", {"const": [[1]]}),        # nested member: impossible
        ("list", {"enum": [[], [1], "foo", 6, {"a": 1}]}),
        ("list", {"enum": ["foo", 6]}),    # no list member: all fail
    ):
        schema = compile_schema(("map", {"properties": {"x": schema_src}}))
        plan = compile_table_plan(schema, tbl.schema)
        assert all(cp.fallback_node is None for cp in plan.column_plans), \
            schema_src
        valid, _ = evaluate_batch(plan, tbl)
        want = [is_valid(schema, {"x": r} if r is not None else {})
                for r in rows]
        assert list(map(bool, valid)) == want, (schema_src, list(valid), want)


def test_list_const_null_elements_match_scalar():
    rows = [[1, None], [1, 2], [None, None], None]
    tbl = pa.table({"x": pa.array(rows, type=pa.list_(pa.int32()))})
    for const in ([1, None], [None, None], [None]):
        schema = compile_schema(
            ("map", {"properties": {"x": ("list", {"const": const})}}))
        plan = compile_table_plan(schema, tbl.schema)
        assert all(cp.fallback_node is None for cp in plan.column_plans)
        valid, _ = evaluate_batch(plan, tbl)
        want = [is_valid(schema, {"x": r} if r is not None else {})
                for r in rows]
        assert list(map(bool, valid)) == want, (const, list(valid), want)


def test_tuple_items_additional_items_vectorized():
    """r4: positional items + additional_items over primitive-element
    lists run pure-vector, matching scalar (length cap, tail schema)."""
    rows = [[1, 2], [1, 2, 3], [1, 2, 3, 4], [], None]
    tbl = pa.table({"x": pa.array(rows, type=pa.list_(pa.int32()))})
    for schema_src in (
        ("list", {"items": ["integer", "integer"],
                  "additional_items": False}),
        ("list", {"items": ["integer"],
                  "additional_items": ("integer", {"maximum": 3})}),
        ("list", {"additional_items": False}),  # no tuple items: ignored
    ):
        schema = compile_schema(("map", {"properties": {"x": schema_src}}))
        plan = compile_table_plan(schema, tbl.schema)
        assert all(cp.fallback_node is None for cp in plan.column_plans), \
            schema_src
        valid, _ = evaluate_batch(plan, tbl)
        want = [is_valid(schema, {"x": r} if r is not None else {})
                for r in rows]
        assert list(map(bool, valid)) == want, (schema_src, list(valid), want)


def test_object_type_union_static_on_list_column():
    """r4: type unions naming map/tuple vectorize over list columns —
    membership is static (an Arrow list is :list, never :map/:tuple)."""
    rows = [[1], [], None]
    tbl = pa.table({"x": pa.array(rows, type=pa.list_(pa.int32()))})
    for schema_src, want_valid in (
        (("map", {"properties": {"x": "map"}}), [False, False, True]),
        (("map", {"properties": {"x": ["list", "map"]}}), [True, True, True]),
        (("map", {"properties": {"x": ["map", "tuple"]}}),
         [False, False, True]),
    ):
        schema = compile_schema(schema_src)
        plan = compile_table_plan(schema, tbl.schema)
        assert all(cp.fallback_node is None for cp in plan.column_plans), \
            schema_src
        valid, _ = evaluate_batch(plan, tbl)
        want = [is_valid(schema, {"x": r} if r is not None else {})
                for r in rows]
        assert list(map(bool, valid)) == want == want_valid, \
            (schema_src, list(valid), want)


def test_not_object_branch_vectorizes_on_int_column():
    """r4: a `not` branch describing an object vectorizes over an int
    column (the branch's map keywords are statically inapplicable)."""
    tbl = pa.table({"x": pa.array([1, 2, None], type=pa.int64())})
    schema = compile_schema(("map", {"properties": {"x": (
        "any", {"not": ("map", {"properties": {"foo": "string"}})})}}))
    plan = compile_table_plan(schema, tbl.schema)
    assert all(cp.fallback_node is None for cp in plan.column_plans)
    valid, _ = evaluate_batch(plan, tbl)
    want = [is_valid(schema, {"x": v}) for v in (1, 2)] + \
        [is_valid(schema, {})]
    assert list(map(bool, valid)) == want


def test_fixed_size_list_column_all_list_keywords():
    """Regression (code-review r4): fixed-size-list columns carry no
    offsets buffer — _list_offsets casts them to variable-size lists —
    and every list keyword must match the scalar interpreter on them,
    including null rows and null elements."""
    from xema_ray.functions.scalar import validate_value

    data = [[1, 2], [2, 2], None, [0, 5], [-1, None], [3, 1], [None, 2]]
    arr = pa.array(data, type=pa.list_(pa.int64(), 2))
    specs = [
        {"const": [1, 2]},
        {"enum": [[1, 2], [3, 1], [0, 0]]},
        {"min_items": 3}, {"max_items": 1},
        {"unique_items": True},
        {"items": ("integer", {"minimum": 1})},
        {"items": [("integer", {"minimum": 1}),
                   ("integer", {"maximum": 3})]},
        {"contains": ("integer", {"minimum": 4})},
    ]
    for spec in specs:
        schema = compile_schema(
            ("map", {"properties": {"l": ("list", spec)}}))
        tbl = pa.table({"l": arr})
        plan = compile_table_plan(schema, tbl.schema)
        valid, viols = evaluate_batch(plan, tbl, fail="finally")
        got = {}
        for cv in viols:
            for j, r in enumerate(cv.row_idx.tolist()):
                p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
                got.setdefault(r, set()).add((p, cv.keyword))
        for i, row in enumerate(tbl.to_pylist()):
            row = {k: v for k, v in row.items() if v is not None}
            sv = validate_value(schema, row, fail="finally")
            want = {(v.path or "/", v.keyword) for v in sv}
            assert bool(valid[i]) == (not want), (spec, i, row)
            assert got.get(i, set()) == want, (spec, i, row,
                                               got.get(i), want)


def test_positional_items_null_element_is_type_violation():
    """Regression (code-review r4): a null element under a positional
    `items` slot with a required type is a TYPE violation (the scalar
    chain checks type first), not the slot's inner keyword; non-null
    failing elements attribute their first failing keyword."""
    from xema_ray.functions.scalar import validate_value

    tbl = pa.table({"l": pa.array([[-1, None], [0, 9], [None, 2]],
                                  type=pa.list_(pa.int64()))})
    schema = compile_schema(("map", {"properties": {"l": (
        "list", {"items": [("integer", {"minimum": 1}),
                           ("integer", {"maximum": 3})]})}}))
    plan = compile_table_plan(schema, tbl.schema)
    valid, viols = evaluate_batch(plan, tbl, fail="finally")
    got = {}
    for cv in viols:
        for j, r in enumerate(cv.row_idx.tolist()):
            p = cv.paths[j] if hasattr(cv.paths, "tolist") else cv.paths
            got.setdefault(r, set()).add((p, cv.keyword))
    assert got[0] == {("/l/0", "minimum"), ("/l/1", "type")}
    assert got[1] == {("/l/0", "minimum"), ("/l/1", "maximum")}
    assert got[2] == {("/l/0", "type")}
    for i, row in enumerate(tbl.to_pylist()):
        sv = validate_value(schema, row, fail="finally")
        assert {(v.path or "/", v.keyword) for v in sv} == got.get(i, set())


def test_fixed_size_list_null_rows_empty_segments():
    """Regression (code-review r4): a null fixed-size-list row must
    yield an EMPTY segment from _list_offsets (pyarrow's FSL->list cast
    keeps list_size-long null segments), or null rows miscount in
    offset-consuming kernels like in-row duplicate detection."""
    from xema_ray.functions.kernels import _list_offsets, inrow_duplicate_rows

    arr = pa.array([[1, 2], [3, 3], None, [4, 5]],
                   type=pa.list_(pa.int64(), 2))
    values, offsets = _list_offsets(arr)
    assert offsets.tolist() == [0, 2, 4, 4, 6]
    assert values.to_pylist() == [1, 2, 3, 3, 4, 5]
    vals = values.to_numpy(zero_copy_only=False)
    # only row 1 has an in-row duplicate; the null row must NOT count
    assert inrow_duplicate_rows(vals, offsets).tolist() == [1]
    # sliced arrays keep the right slot base
    values2, offsets2 = _list_offsets(arr.slice(1, 3))
    assert offsets2.tolist() == [0, 2, 2, 4]
    assert values2.to_pylist() == [3, 3, 4, 5]
