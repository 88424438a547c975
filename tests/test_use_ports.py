"""Hand-ports of the reference suites the extractor's glob does not reach:
test/xema/use/combi_test.exs, test/xema/use/cast_test.exs (issue-157 nested
DateTime struct cast) and test/xema/json_schema/validator_test.exs."""

import datetime as dt

import pytest

from xema_ray import (
    Atom,
    CastError,
    cast_value,
    compile_schema,
    is_valid,
    validate_json_schema,
)

# ----------------------------------------------------------------------
# use/combi_test.exs
# ----------------------------------------------------------------------

LIST_BRANCHES = [("list", {"items": ("integer", {"minimum": 1, "maximum": 66})}),
                 ("list", {"items": ("integer", {"minimum": 33, "maximum": 100})})]


def test_any_of_list_schema():
    s = compile_schema({"any_of": LIST_BRANCHES})
    assert is_valid(s, [20, 30]) and is_valid(s, [40, 50]) and is_valid(s, [60, 70])
    assert not is_valid(s, [10, 90])


def test_any_of_integer_schema():
    s = compile_schema(("integer", {"any_of": [{"minimum": 10}, {"maximum": 5}]}))
    assert is_valid(s, 1) and is_valid(s, 11)
    assert not is_valid(s, 7)


def test_all_of_list_schema():
    s = compile_schema({"all_of": LIST_BRANCHES})
    assert is_valid(s, [40, 50])
    assert not is_valid(s, [10, 90])
    assert not is_valid(s, [20, 30])
    assert not is_valid(s, [60, 70])


def test_all_of_integer_schema():
    s = compile_schema(("integer", {"all_of": [{"multiple_of": 2}, {"multiple_of": 3}]}))
    assert is_valid(s, 6) and is_valid(s, 12)
    assert not is_valid(s, 8) and not is_valid(s, 9)


def test_one_of_list_schema():
    s = compile_schema({"one_of": LIST_BRANCHES})
    assert is_valid(s, [20, 30]) and is_valid(s, [60, 70])
    assert not is_valid(s, [10, 90])
    assert not is_valid(s, [40, 50])   # matches both branches


def test_one_of_integer_schema():
    s = compile_schema(("integer", {"one_of": [{"multiple_of": 2}, {"multiple_of": 3}]}))
    assert is_valid(s, 8) and is_valid(s, 9)
    assert not is_valid(s, 6) and not is_valid(s, 12)   # multiples of both


# ----------------------------------------------------------------------
# use/cast_test.exs — issue-157 nested DateTime inside a user struct
# ----------------------------------------------------------------------


@pytest.fixture()
def bar_schema():
    return compile_schema(("struct", {
        "module": "Bar",
        "properties": {Atom("time"): ("struct", {"module": "DateTime"})},
    }))


EXPECTED = dt.datetime(1984, 3, 4, 13, 37, tzinfo=dt.timezone.utc)


def test_cast_nested_datetime_from_atom_keys(bar_schema):
    out = cast_value(bar_schema, {Atom("time"): "1984-03-04 13:37:00.000000Z"})
    assert out["__struct__"] == "Bar"
    assert out[Atom("time")] == EXPECTED


def test_cast_nested_datetime_from_string_keys(bar_schema):
    out = cast_value(bar_schema, {"time": "1984-03-04 13:37:00.000000Z"})
    assert out["__struct__"] == "Bar"
    assert out[Atom("time")] == EXPECTED


def test_cast_nested_datetime_error(bar_schema):
    with pytest.raises(CastError, match="DateTime"):
        cast_value(bar_schema, {"time": "foo"})


# ----------------------------------------------------------------------
# json_schema/validator_test.exs — metaschema validation
# ----------------------------------------------------------------------

DRAFT_URIS = [
    "http://json-schema.org/draft-04/schema#",
    "http://json-schema.org/draft-06/schema#",
    "http://json-schema.org/draft-07/schema#",
]


@pytest.mark.parametrize("uri", DRAFT_URIS)
def test_metaschema_valid_document(uri):
    assert validate_json_schema(uri, {"minimum": 5}) is None


@pytest.mark.parametrize("uri", DRAFT_URIS)
def test_metaschema_invalid_document_reason_shape(uri):
    reason = validate_json_schema(uri, {"minimum": "5"})
    assert reason == {"properties": {"minimum": {"type": Atom("number"),
                                                 "value": "5"}}}


def test_metaschema_unknown_uri_raises_schema_error():
    from xema_ray import SchemaError

    with pytest.raises(SchemaError, match="unknown metaschema URI"):
        validate_json_schema("http://example.com/nope#", {})
