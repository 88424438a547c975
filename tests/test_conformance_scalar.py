"""Conformance oracles — JSON-Schema-Test-Suite semantics (drafts 4/6/7)
ported as pytest cases, evaluated through the scalar validator.

Mirrors the reference's generated conformance corpus
(test/json_schema_test_suite/draft{4,6,7}/, generator
test/support/mix/tasks/gen/test_suite.ex:39-65).  Each case is
``(json_schema, data, expected_valid)``; deviations from the official suite
follow the reference (strict ===-style equality in uniqueItems/enum).
"""

import pytest

from xema_ray.schema.json_schema import from_json_schema
from xema_ray.functions.scalar import is_valid, validate_value

# (name, schema, data, valid)
CASES = [
    # --- type ---------------------------------------------------------
    ("int accepts int", {"type": "integer"}, 1, True),
    ("int accepts zero-fraction float", {"type": "integer"}, 1.0, True),
    ("int rejects fraction", {"type": "integer"}, 1.1, False),
    ("int rejects string", {"type": "integer"}, "1", False),
    ("int rejects bool", {"type": "integer"}, True, False),
    ("number accepts float", {"type": "number"}, 1.1, True),
    ("number accepts int", {"type": "number"}, 1, True),
    ("number rejects bool", {"type": "number"}, True, False),
    ("string accepts str", {"type": "string"}, "foo", True),
    ("string rejects number", {"type": "string"}, 1, False),
    ("boolean accepts true", {"type": "boolean"}, True, True),
    ("boolean rejects 0", {"type": "boolean"}, 0, False),
    ("null accepts None", {"type": "null"}, None, True),
    ("null rejects 0", {"type": "null"}, 0, False),
    ("object accepts dict", {"type": "object"}, {}, True),
    ("object rejects list", {"type": "object"}, [], False),
    ("array accepts list", {"type": "array"}, [], True),
    ("array rejects dict", {"type": "array"}, {}, False),
    ("union first match", {"type": ["integer", "string"]}, "x", True),
    ("union no match", {"type": ["integer", "string"]}, 1.5, False),
    ("union keywords apply", {"type": ["integer", "string"], "minLength": 2}, "a", False),
    ("union keywords other branch", {"type": ["integer", "string"], "minLength": 2}, 5, True),
    # --- boolean schemas ----------------------------------------------
    ("true schema", True, {"anything": 1}, True),
    ("false schema", False, 1, False),
    # --- const --------------------------------------------------------
    ("const int", {"const": 2}, 2, True),
    ("const int float-equal", {"const": 2}, 2.0, True),
    ("const mismatch", {"const": 2}, 3, False),
    ("const null valid", {"const": None}, None, True),
    ("const null invalid", {"const": None}, 0, False),
    ("const object", {"const": {"a": 1}}, {"a": 1}, True),
    ("const object mismatch", {"const": {"a": 1}}, {"a": 2}, False),
    ("const bool not int", {"const": True}, 1, False),
    # --- enum ---------------------------------------------------------
    ("enum member", {"enum": [1, 2, 3]}, 2, True),
    ("enum non-member", {"enum": [1, 2, 3]}, 4, False),
    ("enum int matches float member", {"enum": [1.0]}, 1, True),
    ("enum float matches int member", {"enum": [1]}, 1.0, True),
    ("enum bool distinct from 1", {"enum": [1]}, True, False),
    ("enum heterogeneous", {"enum": [6, "foo", [], True, {"foo": 12}]}, {"foo": 12}, True),
    ("enum heterogeneous miss", {"enum": [6, "foo", [], True, {"foo": 12}]}, {"foo": 13}, False),
    # --- numeric ------------------------------------------------------
    ("minimum ok", {"minimum": 1.1}, 1.1, True),
    ("minimum above", {"minimum": 1.1}, 2.6, True),
    ("minimum below", {"minimum": 1.1}, 0.6, False),
    ("minimum ignores non-number", {"minimum": 1.1}, "x", True),
    ("maximum ok", {"maximum": 3.0}, 3.0, True),
    ("maximum above", {"maximum": 3.0}, 3.5, False),
    ("exclusiveMinimum numeric ok", {"exclusiveMinimum": 1.1}, 1.2, True),
    ("exclusiveMinimum numeric boundary", {"exclusiveMinimum": 1.1}, 1.1, False),
    ("exclusiveMaximum numeric boundary", {"exclusiveMaximum": 3.0}, 3.0, False),
    ("draft4 exclusiveMinimum bool", {"minimum": 1.1, "exclusiveMinimum": True}, 1.1, False),
    ("draft4 exclusiveMinimum bool ok", {"minimum": 1.1, "exclusiveMinimum": True}, 1.2, True),
    ("draft4 exclusiveMaximum bool", {"maximum": 3.0, "exclusiveMaximum": True}, 3.0, False),
    ("draft4 exclusive false boundary ok", {"maximum": 3.0, "exclusiveMaximum": False}, 3.0, True),
    ("multipleOf int", {"multipleOf": 2}, 10, True),
    ("multipleOf int bad", {"multipleOf": 2}, 7, False),
    ("multipleOf float", {"multipleOf": 0.0001}, 0.0075, True),
    ("multipleOf float bad", {"multipleOf": 0.0001}, 0.00751, False),
    ("multipleOf ignores non-number", {"multipleOf": 2}, "x", True),
    # --- string -------------------------------------------------------
    ("minLength ok", {"minLength": 2}, "foo", True),
    ("minLength exact", {"minLength": 2}, "fo", True),
    ("minLength short", {"minLength": 2}, "f", False),
    ("minLength ignores non-string", {"minLength": 2}, 1, True),
    ("minLength graphemes", {"minLength": 2}, "ée", True),  # é (combining) + e = 2
    ("maxLength ok", {"maxLength": 2}, "f", True),
    ("maxLength long", {"maxLength": 2}, "foo", False),
    ("pattern match", {"pattern": "^a*$"}, "aaa", True),
    ("pattern no match", {"pattern": "^a*$"}, "abc", False),
    ("pattern unanchored mid-string", {"pattern": "a+"}, "xxaayy", True),
    ("pattern ignores non-string", {"pattern": "^a*$"}, True, True),
    # --- formats ------------------------------------------------------
    ("format date valid", {"format": "date"}, "1963-06-19", True),
    ("format date invalid day", {"format": "date"}, "1963-06-40", False),
    ("format date non-calendar", {"format": "date"}, "2021-02-30", False),
    ("format date-time valid", {"format": "date-time"}, "1963-06-19T08:30:06.283185Z", True),
    ("format date-time offset", {"format": "date-time"}, "1937-01-01T12:00:27.87+00:20", True),
    ("format date-time invalid", {"format": "date-time"}, "1990-02-31T15:59:60.123-08:00", False),
    ("format date-time not date", {"format": "date-time"}, "06/19/1963 08:30:06 PST", False),
    ("format time valid", {"format": "time"}, "08:30:06Z", True),
    ("format time invalid", {"format": "time"}, "25:00:00Z", False),
    ("format email valid", {"format": "email"}, "joe.bloggs@example.com", True),
    ("format email invalid", {"format": "email"}, "2962", False),
    ("format email no-at", {"format": "email"}, "foo.bar.net", False),
    ("format hostname valid", {"format": "hostname"}, "www.example.com", True),
    ("format hostname invalid", {"format": "hostname"}, "-a-host-name", False),
    ("format ipv4 valid", {"format": "ipv4"}, "192.168.0.1", True),
    ("format ipv4 out-of-range", {"format": "ipv4"}, "256.256.256.256", False),
    ("format ipv6 valid", {"format": "ipv6"}, "::1", True),
    ("format ipv6 invalid", {"format": "ipv6"}, "12345::", False),
    ("format json-pointer valid", {"format": "json-pointer"}, "/foo/bar~0/baz~1/%a", True),
    ("format json-pointer invalid", {"format": "json-pointer"}, "/foo/bar~", False),
    ("format regex valid", {"format": "regex"}, "([abc])+\\s+$", True),
    ("format regex invalid", {"format": "regex"}, "^(abc]", False),
    ("format uri valid", {"format": "uri"}, "http://foo.bar/?baz=qux#quux", True),
    ("format uri no scheme", {"format": "uri"}, "//foo.bar/?baz=qux#quux", False),
    ("format uri-reference valid", {"format": "uri-reference"}, "/abc", True),
    ("format unknown is noop", {"format": "unknown-format"}, "anything", True),
    ("format ignores non-string", {"format": "email"}, 12, True),
    # --- arrays -------------------------------------------------------
    ("items all valid", {"items": {"type": "integer"}}, [1, 2, 3], True),
    ("items one invalid", {"items": {"type": "integer"}}, [1, "x"], False),
    ("items ignores non-array", {"items": {"type": "integer"}}, {"foo": "bar"}, True),
    ("items nested", {"items": {"items": {"type": "integer"}}}, [[1], [2, 3]], True),
    ("items nested invalid", {"items": {"items": {"type": "integer"}}}, [[1], ["x"]], False),
    ("items false empty ok", {"items": False}, [], True),
    ("items false nonempty", {"items": False}, [1], False),
    ("positional items", {"items": [{"type": "integer"}, {"type": "string"}]}, [1, "a"], True),
    ("positional items wrong", {"items": [{"type": "integer"}, {"type": "string"}]}, ["a", 1], False),
    ("positional extra allowed", {"items": [{"type": "integer"}]}, [1, "extra"], True),
    ("additionalItems false", {"items": [{"type": "integer"}], "additionalItems": False}, [1, 2], False),
    ("additionalItems schema ok", {"items": [{}], "additionalItems": {"type": "integer"}}, [None, 2], True),
    ("additionalItems schema bad", {"items": [{}], "additionalItems": {"type": "integer"}}, [None, "x"], False),
    ("minItems ok", {"minItems": 1}, [1], True),
    ("minItems short", {"minItems": 1}, [], False),
    ("maxItems ok", {"maxItems": 2}, [1, 2], True),
    ("maxItems long", {"maxItems": 2}, [1, 2, 3], False),
    ("uniqueItems ok", {"uniqueItems": True}, [1, 2], True),
    ("uniqueItems dup", {"uniqueItems": True}, [1, 1], False),
    ("uniqueItems float dup", {"uniqueItems": True}, [1.0, 1.0, 1], False),
    ("uniqueItems false-vs-0", {"uniqueItems": True}, [0, False], True),
    ("uniqueItems true-vs-1", {"uniqueItems": True}, [1, True], True),
    ("uniqueItems nested arrays", {"uniqueItems": True}, [["foo"], ["foo"]], False),
    ("uniqueItems objects", {"uniqueItems": True}, [{"a": 1}, {"a": 1}], False),
    ("uniqueItems objects diff", {"uniqueItems": True}, [{"a": 1}, {"a": 2}], True),
    ("uniqueItems false anything", {"uniqueItems": False}, [1, 1], True),
    ("contains match", {"contains": {"minimum": 5}}, [3, 4, 5], True),
    ("contains no match", {"contains": {"minimum": 5}}, [1, 2, 3], False),
    ("contains empty array", {"contains": {"minimum": 5}}, [], False),
    # --- objects ------------------------------------------------------
    ("properties ok", {"properties": {"foo": {"type": "integer"}}}, {"foo": 1}, True),
    ("properties bad", {"properties": {"foo": {"type": "integer"}}}, {"foo": "x"}, False),
    ("properties missing ok", {"properties": {"foo": {"type": "integer"}}}, {}, True),
    ("required present", {"required": ["foo"]}, {"foo": 1}, True),
    ("required missing", {"required": ["foo"]}, {}, False),
    ("required ignores non-object", {"required": ["foo"]}, [], True),
    ("additionalProperties false ok", {"properties": {"foo": {}}, "additionalProperties": False}, {"foo": 1}, True),
    ("additionalProperties false extra", {"properties": {"foo": {}}, "additionalProperties": False}, {"foo": 1, "bar": 2}, False),
    ("additionalProperties schema ok", {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}}, {"foo": 1, "bar": True}, True),
    ("additionalProperties schema bad", {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}}, {"foo": 1, "bar": 2}, False),
    ("patternProperties exempts additionals", {"patternProperties": {"^v": {}}, "additionalProperties": False}, {"vroom": 2}, True),
    ("patternProperties match ok", {"patternProperties": {"f.*o": {"type": "integer"}}}, {"foo": 1}, True),
    ("patternProperties match bad", {"patternProperties": {"f.*o": {"type": "integer"}}}, {"foo": "x"}, False),
    ("propertyNames ok", {"propertyNames": {"maxLength": 3}}, {"f": {}, "foo": {}}, True),
    ("propertyNames bad", {"propertyNames": {"maxLength": 3}}, {"foobar": {}}, False),
    ("minProperties ok", {"minProperties": 1}, {"a": 1}, True),
    ("minProperties bad", {"minProperties": 1}, {}, False),
    ("maxProperties ok", {"maxProperties": 2}, {"a": 1}, True),
    ("maxProperties bad", {"maxProperties": 2}, {"a": 1, "b": 2, "c": 3}, False),
    ("dependencies list ok", {"dependencies": {"bar": ["foo"]}}, {"foo": 1, "bar": 2}, True),
    ("dependencies list missing", {"dependencies": {"bar": ["foo"]}}, {"bar": 2}, False),
    ("dependencies absent key ok", {"dependencies": {"bar": ["foo"]}}, {"foo": 1}, True),
    ("dependencies schema ok", {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}}}}}, {"bar": 1, "foo": 2}, True),
    ("dependencies schema bad", {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}}}}}, {"bar": 1, "foo": "x"}, False),
    # --- combinators --------------------------------------------------
    ("allOf ok", {"allOf": [{"minimum": 1}, {"maximum": 3}]}, 2, True),
    ("allOf one fails", {"allOf": [{"minimum": 1}, {"maximum": 3}]}, 5, False),
    ("anyOf first", {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, 1, True),
    ("anyOf second", {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, 2.5, True),
    ("anyOf none", {"anyOf": [{"type": "integer"}, {"minimum": 2}]}, 1.5, False),
    ("oneOf exactly one", {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, 1, True),
    ("oneOf both", {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, 3, False),
    ("oneOf none", {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, 1.5, False),
    ("not ok", {"not": {"type": "integer"}}, "foo", True),
    ("not fails", {"not": {"type": "integer"}}, 1, False),
    ("not multiple types", {"not": {"type": ["integer", "boolean"]}}, "foo", True),
    ("if-then pass", {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}}, -1, True),
    ("if-then fail", {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}}, -100, False),
    ("if-else used", {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}}, 4, True),
    ("if-else fail", {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}}, 3, False),
    ("if without then/else", {"if": {"exclusiveMaximum": 0}}, 3, True),
    # --- refs ---------------------------------------------------------
    ("ref definitions ok", {"definitions": {"pos": {"type": "integer", "minimum": 0}},
                            "properties": {"n": {"$ref": "#/definitions/pos"}}}, {"n": 1}, True),
    ("ref definitions bad", {"definitions": {"pos": {"type": "integer", "minimum": 0}},
                             "properties": {"n": {"$ref": "#/definitions/pos"}}}, {"n": -1}, False),
    ("ref root", {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False},
     {"foo": {"foo": {}}}, True),
    ("ref root violation", {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False},
     {"bar": False}, False),
    ("ref nested pointer", {"properties": {"a": {"type": "integer"}},
                            "definitions": {"x": {"$ref": "#/properties/a"}},
                            "patternProperties": {"^b$": {"$ref": "#/definitions/x"}}},
     {"a": 1, "b": "no"}, False),
    ("circular ref list ok",
     {"definitions": {"node": {"type": "object",
                               "properties": {"next": {"$ref": "#/definitions/node"}}}},
      "$ref": "#/definitions/node"},
     {"next": {"next": {}}}, True),
    ("circular ref list bad",
     {"definitions": {"node": {"type": "object",
                               "properties": {"next": {"$ref": "#/definitions/node"}}}},
      "$ref": "#/definitions/node"},
     {"next": {"next": 5}}, False),
]


@pytest.mark.parametrize("name,schema,data,valid", CASES, ids=[c[0] for c in CASES])
def test_conformance(name, schema, data, valid):
    compiled = from_json_schema(schema)
    assert is_valid(compiled, data) == valid, validate_value(compiled, data)


def test_elixir_specific_types():
    """tuple / keyword / atom / struct scalar types (Xema's Elixir-isms,
    validator.ex:236-260) over Python stand-ins."""
    from xema_ray.functions.scalar import Atom
    from xema_ray.schema.builder import compile_schema

    tup = compile_schema(("tuple", {"min_items": 2, "items": "integer"}))
    assert is_valid(tup, (1, 2))
    assert not is_valid(tup, (1,))
    assert not is_valid(tup, [1, 2])  # list is not a tuple
    assert not is_valid(tup, (1, "x"))

    kw = compile_schema(("keyword", {"properties": {Atom("a"): "integer"},
                                     "required": [Atom("a")]}))
    assert is_valid(kw, [(Atom("a"), 1)])
    assert not is_valid(kw, [(Atom("b"), 2)])
    assert not is_valid(kw, {"a": 1})  # map is not a keyword list

    atom = compile_schema("atom")
    assert is_valid(atom, Atom("ok"))
    assert is_valid(atom, True)
    assert is_valid(atom, None)
    assert not is_valid(atom, "plain-string")

    struct = compile_schema(("struct", {"module": "User",
                                        "properties": {"name": "string"}}))
    assert is_valid(struct, {"__struct__": "User", "name": "n"})
    assert not is_valid(struct, {"__struct__": "Other", "name": "n"})
    assert not is_valid(struct, {"name": "n"})


def test_violations_have_paths():
    compiled = from_json_schema(
        {"properties": {"a": {"items": {"type": "integer"}}}}
    )
    v = validate_value(compiled, {"a": [1, "x", 2.5]})
    assert {x.path for x in v} == {"/a/1", "/a/2"}
    assert all(x.keyword == "type" for x in v)


def test_fail_modes_reference_multi_case():
    """The reference's opt_fail_test.exs:34-118 'multi' map case:
    immediately/early stop at max_properties (size precedes properties in
    the map chain); finally collects every keyword group."""
    from xema_ray.schema.builder import compile_schema

    schema = compile_schema(("map", {
        "properties": {"foo": "integer", "bar": "integer"},
        "max_properties": 3,
        "pattern_properties": {"str_.*": "string"},
        "additional_properties": False,
    }))
    data = {"foo": "bar", "baz": 5, "str_a": "a", "str_b": "b", "z": 1}

    imm = validate_value(schema, data, fail="immediately")
    assert [v.keyword for v in imm] == ["max_properties"]
    early = validate_value(schema, data, fail="early")
    assert [v.keyword for v in early] == ["max_properties"]
    fin = validate_value(schema, data, fail="finally")
    kws = sorted(v.keyword for v in fin)
    assert kws == ["additional_properties", "additional_properties",
                   "max_properties", "type"]


def test_fail_modes():
    """opt_fail_test.exs:34-118 semantics: same verdict, different counts."""
    compiled = from_json_schema(
        {"properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
         "minProperties": 3}
    )
    data = {"a": "x", "b": "y"}
    imm = validate_value(compiled, data, fail="immediately")
    early = validate_value(compiled, data, fail="early")
    fin = validate_value(compiled, data, fail="finally")
    assert len(imm) == 1
    assert len(early) >= 1
    assert len(fin) >= len(early)
    # early: sibling property errors are both collected once we get past size
    early_props = validate_value(
        from_json_schema({"properties": {"a": {"type": "integer"}, "b": {"type": "integer"}}}),
        data, fail="early")
    assert len(early_props) == 2
    # finally collects across keyword groups
    assert any(x.keyword == "min_properties" for x in fin)
    assert any(x.keyword == "type" for x in fin)
