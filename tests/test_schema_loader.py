"""Schema sources: DSL builder edge cases, JSON-Schema drafts, remote-ref
loader plug-in (reference Xema.Loader behaviour, lib/xema/loader.ex)."""

import json

import pytest

from xema_ray.functions.scalar import is_valid
from xema_ray.schema.builder import SchemaError, compile_schema
from xema_ray.schema.json_schema import detect_draft, from_json_schema


def test_meta_validation_rejects_bad_keywords():
    with pytest.raises(SchemaError):
        compile_schema(("integer", {"minimum": "x"}))
    with pytest.raises(SchemaError):
        compile_schema(("string", {"min_length": -1}))
    with pytest.raises(SchemaError):
        compile_schema(("string", {"pattern": "("}))
    with pytest.raises(SchemaError):
        compile_schema({"enum": []})
    with pytest.raises(SchemaError):
        compile_schema("not-a-type")
    with pytest.raises(SchemaError):
        compile_schema({"ref": "#/definitions/missing"})


def test_python_type_aliases():
    assert is_valid(compile_schema(int), 3)
    assert not is_valid(compile_schema(int), "3")
    assert is_valid(compile_schema((dict, {"properties": {"a": str}})), {"a": "x"})


def test_detect_draft():
    assert detect_draft({"$schema": "http://json-schema.org/draft-04/schema#"}) == "draft4"
    assert detect_draft({"$schema": "http://json-schema.org/draft-06/schema#"}) == "draft6"
    assert detect_draft({}) == "draft7"


def test_json_schema_meta_check():
    with pytest.raises(SchemaError):
        from_json_schema({"type": "zebra"})
    with pytest.raises(SchemaError):
        from_json_schema({"allOf": []})
    with pytest.raises(SchemaError):
        from_json_schema(True, draft="draft4")  # bool schemas are draft-6+


def test_file_loader_remote_ref(tmp_path):
    """A Loader resolves non-local refs at compile time (the reference's
    remote-ref integration, test/support/file_loader.ex analogue)."""
    remote = {"type": "integer", "minimum": 0}
    p = tmp_path / "positive.json"
    p.write_text(json.dumps(remote))

    def file_loader(uri: str):
        assert uri.startswith("file://")
        with open(uri[len("file://"):]) as f:
            return json.load(f)

    schema = compile_schema(
        {"properties": {"n": {"ref": f"file://{p}#"}}},
        loader=file_loader,
    )
    assert is_valid(schema, {"n": 3})
    assert not is_valid(schema, {"n": -3})


def test_no_loader_refuses_remote_refs():
    with pytest.raises(SchemaError):
        compile_schema({"properties": {"n": {"ref": "http://example.com/s#"}}})


def test_nested_pointer_registration():
    schema = compile_schema({
        "definitions": {"a": {"properties": {"deep": ("integer", {"minimum": 1})}}},
        "properties": {"x": {"ref": "#/definitions/a/properties/deep"}},
    })
    assert is_valid(schema, {"x": 2})
    assert not is_valid(schema, {"x": 0})


def test_id_anchor_resolution():
    schema = compile_schema({
        "definitions": {"pos": {"id": "http://example.com/pos", "type": "integer",
                                "minimum": 0}},
        "properties": {"n": {"ref": "http://example.com/pos"}},
    })
    assert is_valid(schema, {"n": 1})
    assert not is_valid(schema, {"n": -1})


def test_data_side_channel():
    compiled = compile_schema(("integer", {"custom-annotation": {"x": 1}}))
    assert compiled.root.data == {"custom-annotation": {"x": 1}}
