"""Cast/coercion semantics (reference Xema.cast, SURVEY.md §2.2) — scalar
path + vectorized normalize stage."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from xema_ray.functions.cast import CastError, cast, cast_value
from xema_ray.functions.scalar import Atom
from xema_ray.schema.builder import compile_schema

OK_CASES = [
    ("integer", "5", 5),
    ("integer", 5, 5),
    ("float", "5.5", 5.5),
    ("float", "5", 5.0),
    ("float", 5, 5.0),
    ("number", "5", 5),
    ("number", "5.5", 5.5),
    ("string", 5, "5"),
    ("string", 5.5, "5.5"),
    ("string", "x", "x"),
    ("boolean", "true", True),
    ("boolean", "false", False),
    (["integer", "string"], "abc", "abc"),   # union: first castable type
    (["integer", "string"], "5", 5),
    ("list", (1, 2), [1, 2]),
    ("tuple", [1, 2], (1, 2)),
    ("map", [(Atom("a"), 1), (Atom("b"), 2)], {Atom("a"): 1, Atom("b"): 2}),
    ("keyword", {Atom("a"): 1}, [(Atom("a"), 1)]),
]

FAIL_CASES = [
    ("integer", "5x"),
    ("integer", "5.5"),
    ("integer", 5.5),      # float→integer is not a cast
    ("float", "x"),
    ("boolean", "TRUE"),
    ("boolean", 1),
    ("string", None),
    ("nil", 0),
]


@pytest.mark.parametrize("src,value,expected", OK_CASES,
                         ids=[f"{c[0]}<-{c[1]!r}" for c in OK_CASES])
def test_cast_ok(src, value, expected):
    out = cast_value(compile_schema(src), value)
    assert out == expected
    assert type(out) is type(expected)


@pytest.mark.parametrize("src,value", FAIL_CASES,
                         ids=[f"{c[0]}<-{c[1]!r}" for c in FAIL_CASES])
def test_cast_fail(src, value):
    with pytest.raises(CastError):
        cast_value(compile_schema(src), value)


def test_cast_struct_modules():
    assert cast_value(compile_schema(("struct", {"module": "Decimal"})), "1.5") == Decimal("1.5")
    assert cast_value(compile_schema(("struct", {"module": "Date"})), "2021-03-04") == dt.date(2021, 3, 4)
    assert cast_value(compile_schema(("struct", {"module": "Time"})), "08:30:00") == dt.time(8, 30)
    with pytest.raises(CastError):
        cast_value(compile_schema(("struct", {"module": "Date"})), "2021-13-04")


def test_cast_recurses_into_containers():
    schema = compile_schema(("map", {
        "properties": {"a": "integer", "b": ("list", {"items": "float"})},
    }))
    out = cast_value(schema, {"a": "5", "b": ["1", "2.5"], "extra": "x"})
    assert out == {"a": 5, "b": [1.0, 2.5], "extra": "x"}


def test_cast_required_precheck():
    schema = compile_schema(("map", {"properties": {"a": "integer"}, "required": ["a"]}))
    with pytest.raises(CastError):
        cast_value(schema, {})


def test_cast_defaults_fill():
    schema = compile_schema(("map", {"properties": {
        "a": ("integer", {"default": 7}),
        "b": "string",
    }}))
    assert cast_value(schema, {"b": "x"}) == {"b": "x", "a": 7}
    # present values not overwritten
    assert cast_value(schema, {"a": "3"}) == {"a": 3}


def test_cast_delete_additionals():
    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "additional_properties": False,
    }))
    out = cast_value(schema, {"a": "1", "junk": 9}, additional_properties="delete")
    assert out == {"a": 1}


def test_cast_combiner_declaration_order_first_success():
    # the reference's reversed reduce keeps overwriting, so the FIRST
    # declared branch that casts+validates wins (xema.ex:1086-1115,
    # pinned by cast/any_of_test.exs "from an integer string" → 9)
    schema = compile_schema({"any_of": [("integer", {}), ("string", {})]})
    assert cast_value(schema, "5") == 5
    schema2 = compile_schema({"any_of": [("string", {}), ("integer", {})]})
    assert cast_value(schema2, "5") == "5"


def test_cast_then_validate():
    schema = compile_schema(("integer", {"minimum": 10}))
    value, violations = cast(schema, "5")
    assert value == 5
    assert violations and violations[0].keyword == "minimum"
    value, violations = cast(schema, "15")
    assert value == 15 and not violations


def test_positional_items_cast():
    schema = compile_schema(("tuple", {"items": [("integer", {}), ("string", {})]}))
    assert cast_value(schema, ["5", 6]) == (5, "6")


# ----------------------------------------------------------------------
# vectorized normalize stage
# ----------------------------------------------------------------------


def test_normalizer_batch():
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {"properties": {
        "n": "integer",
        "x": "float",
        "flag": "boolean",
        "label": ("string", {"default": "unk"}),
    }}))
    tbl = pa.table({
        "n": pa.array(["1", "2", None]),
        "x": pa.array([1, 2, 3]),
        "flag": pa.array(["true", "false", None]),
        "label": pa.array(["a", None, None]),
    })
    out = make_normalizer(schema)(tbl)
    assert out["n"].to_pylist() == [1, 2, None]
    assert out["x"].to_pylist() == [1.0, 2.0, 3.0]
    assert out["flag"].to_pylist() == [True, False, None]
    assert out["label"].to_pylist() == ["a", "unk", "unk"]


def test_normalizer_full_parse_error_and_null_mode():
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {"properties": {"n": "integer"}}))
    tbl = pa.table({"n": pa.array(["1", "5x"])})
    with pytest.raises(CastError):
        make_normalizer(schema)(tbl)
    out = make_normalizer(schema, on_error="null")(tbl)
    assert out["n"].to_pylist() == [1, None]


def test_normalizer_delete_additionals():
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {
        "properties": {"a": "integer"},
        "additional_properties": False,
    }))
    tbl = pa.table({"a": [1], "junk": ["x"]})
    out = make_normalizer(schema, additional_properties="delete")(tbl)
    assert out.column_names == ["a"]


def test_cast_circular_pure_ref_raises():
    """ADVICE r1: a pure-$ref cycle must raise, not loop forever."""
    s = compile_schema({"definitions": {"a": {"$ref": "#/definitions/b"},
                                        "b": {"$ref": "#/definitions/a"}},
                        "properties": {"n": {"$ref": "#/definitions/a"}}})
    with pytest.raises(CastError, match="circular"):
        cast_value(s, {"n": 1})


@pytest.mark.parametrize("src,value", [
    ("integer", "1_000"), ("integer", " 5 "), ("integer", "+ 5"),
    ("float", "nan"), ("float", "inf"), ("float", "1_0.5"),
    ("number", "infinity"),
])
def test_full_parse_rejects_python_liberal_numerics(src, value):
    """code-review r2: Python int()/float() accept underscores, padding
    and inf/nan — the Elixir parses reject all of them."""
    with pytest.raises(CastError):
        cast_value(compile_schema(src), value)


@pytest.mark.parametrize("value,t", [
    ("inf", "float"), ("nan", "float"), ("Infinity", "float"),
    ("5.", "float"), (".5", "float"), ("1_000", "integer"), (" 5 ", "integer"),
])
def test_normalizer_rejects_liberal_numerics(value, t):
    """code-review r2 batch 4: the vectorized normalizer must apply the
    same full-parse grammar as the scalar cast — Arrow's own string cast
    accepts inf/nan/"5."/".5" and the old salvage loop accepted
    underscores/padding."""
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {"properties": {"v": t}}))
    tbl = pa.table({"v": pa.array([value, "1"])})
    with pytest.raises(CastError):
        make_normalizer(schema)(tbl)
    out = make_normalizer(schema, on_error="null")(tbl)
    assert out["v"].to_pylist()[0] is None
    assert out["v"].to_pylist()[1] == 1


def test_normalizer_accepts_plus_prefixed_integer():
    """Arrow's int parser rejects '+5'; the Elixir grammar accepts it."""
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {"properties": {"v": "integer"}}))
    out = make_normalizer(schema)(pa.table({"v": pa.array(["+5", "-3", None])}))
    assert out["v"].to_pylist() == [5, -3, None]


def test_normalizer_int64_overflow_nulls_or_raises():
    from xema_ray.stages.cast import make_normalizer

    schema = compile_schema(("map", {"properties": {"v": "integer"}}))
    tbl = pa.table({"v": pa.array(["99999999999999999999999", "2"])})
    with pytest.raises(CastError):
        make_normalizer(schema)(tbl)
    out = make_normalizer(schema, on_error="null")(tbl)
    assert out["v"].to_pylist() == [None, 2]
