"""Schema → source round-trip (Xema.source/1 analogue): re-compiling the
reconstructed source preserves validation behavior across the whole
reference conformance corpus."""

import pytest

from suite_port import load_cases
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import compile_schema
from xema_ray.schema.json_schema import from_json_schema
from xema_ray.schema.source import schema_source


def test_simple_round_trips():
    for src in [
        "integer",
        ("integer", {"minimum": 0}),
        ("map", {"properties": {"a": ("list", {"items": "integer"})},
                 "required": ["a"]}),
        {"one_of": ["integer", "string"]},
        True,
        False,
    ]:
        c1 = compile_schema(src)
        src2 = schema_source(c1)
        c2 = compile_schema(src2)
        for probe in (1, 1.5, "x", None, [1], {"a": [1]}, {"a": "x"}):
            assert is_valid(c1, probe) == is_valid(c2, probe), (src, src2, probe)


def test_round_trip_on_reference_corpus():
    """compile → source → compile is behavior-preserving for every draft7
    conformance case (non-ref schemas; refs need the original refs map)."""
    checked = 0
    for cid, draft, schema, data, expected in load_cases(drafts=("draft7",)):
        if "$ref" in str(schema):
            continue  # pointer refs don't survive source extraction alone
        c1 = from_json_schema(schema, draft=draft, validate=False)
        try:
            c2 = compile_schema(schema_source(c1))
        except Exception as e:
            pytest.fail(f"{cid}: recompile failed: {e!r}")
        assert is_valid(c2, data) == expected == is_valid(c1, data), cid
        checked += 1
    assert checked > 400
