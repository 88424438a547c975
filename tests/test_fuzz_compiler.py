"""Robustness fuzz: the schema compiler either compiles or raises
SchemaError — never an unhandled crash — and the scalar validator never
raises on any (schema, data) pair that compiled."""

from hypothesis import given, settings
from hypothesis import strategies as st

from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import SchemaError, compile_schema

json_val = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-5, 5),
              st.floats(-5, 5, allow_nan=False),
              st.sampled_from(["a", "b", "^a", "integer", "string"])),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from(
            ["type", "minimum", "maximum", "minLength", "pattern", "items",
             "properties", "required", "enum", "const", "allOf", "anyOf",
             "oneOf", "not", "if", "then", "else", "$ref", "definitions",
             "uniqueItems", "additionalProperties", "dependencies",
             "multipleOf", "contains", "patternProperties", "propertyNames",
             "additionalItems", "format", "exclusiveMinimum",
             "exclusiveMaximum", "maxLength", "minItems"]),
            children, max_size=4)),
    max_leaves=14)


@settings(max_examples=400, deadline=None)
@given(src=json_val, data=json_val)
def test_compile_or_schemaerror_never_crash(src, data):
    try:
        compiled = compile_schema(src)
    except SchemaError:
        return
    is_valid(compiled, data)


def test_list_of_struct_falls_back_correctly():
    """items: map-schema over a list<struct> column runs VECTORIZED (r2:
    nested sub-table plan) and agrees with the ground truth."""
    import pyarrow as pa

    from xema_ray.functions.kernels import compile_table_plan, evaluate_batch

    schema = compile_schema(("map", {"properties": {
        "events": ("list", {"items": ("map", {
            "properties": {"k": ("integer", {"minimum": 0})},
            "required": ["k"]})}),
    }}))
    rows = [
        {"events": [{"k": 1}, {"k": 2}]},
        {"events": [{"k": -1}]},
        {"events": [{"k": None}]},
        {"events": None},
        {"events": []},
    ]
    tbl = pa.Table.from_pylist(rows)
    plan = compile_table_plan(schema, tbl.schema)
    assert plan.column_plans[0].fallback_node is None
    valid, _ = evaluate_batch(plan, tbl)
    assert list(map(bool, valid)) == [True, False, False, True, True]


from xema_ray.functions.cast import CastError, cast_value  # noqa: E402

_cast_data = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-9, 9),
              st.floats(-9, 9, allow_nan=False),
              st.sampled_from(["5", "5.5", "x", "true"])),
    lambda ch: st.one_of(st.lists(ch, max_size=3),
                         st.dictionaries(st.sampled_from(["a", "b"]), ch, max_size=3),
                         st.tuples(ch, ch)),
    max_leaves=8)

_cast_schema = st.recursive(
    st.sampled_from(["integer", "float", "number", "string", "boolean", "nil",
                     "list", "tuple", "map", "keyword", "any", True, False]),
    lambda ch: st.one_of(
        st.builds(lambda t, kw: (t, kw),
                  st.sampled_from(["integer", "string", "list", "map", "tuple"]),
                  st.fixed_dictionaries({}, optional={
                      "items": ch,
                      "properties": st.dictionaries(st.sampled_from(["a", "b"]),
                                                    ch, max_size=2),
                      "default": st.integers(-3, 3),
                  })),
        st.builds(lambda bs: {"any_of": bs}, st.lists(ch, min_size=1, max_size=2)),
    ),
    max_leaves=6)


@settings(max_examples=300, deadline=None)
@given(src=_cast_schema, data=_cast_data)
def test_cast_never_crashes(src, data):
    try:
        compiled = compile_schema(src)
    except SchemaError:
        return
    try:
        cast_value(compiled, data)
    except CastError:
        pass
