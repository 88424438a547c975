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
