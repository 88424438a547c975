"""Builder-DSL sugar + error formatting + normalize→validate integration."""

import pyarrow as pa
import pytest

from xema_ray import (
    ValidationError,
    format_violations,
    is_valid,
    validate_or_raise,
)
from xema_ray.schema.dsl import (
    all_of,
    any_of,
    integer,
    list_,
    map_,
    not_,
    one_of,
    ref,
    schema,
    string,
)


def test_dsl_builders():
    s = schema(map_(
        properties={
            "doc_id": string(pattern=r"^[a-z]+$"),
            "tokens": list_(items=integer(minimum=0), min_items=1),
            "kind": any_of(string(), integer()),
        },
        required=["doc_id"],
    ))
    assert is_valid(s, {"doc_id": "abc", "tokens": [1, 2], "kind": 5})
    assert not is_valid(s, {"doc_id": "ABC"})
    assert not is_valid(s, {"doc_id": "abc", "tokens": []})


def test_dsl_combinators_and_ref():
    s = schema({
        "definitions": {"pos": integer(minimum=0)},
        "properties": {
            "a": one_of(integer(maximum=0), integer(minimum=10)),
            "b": not_(string()),
            "c": all_of(integer(), integer(minimum=5)),
            "d": ref("#/definitions/pos"),
        },
    })
    assert is_valid(s, {"a": -1, "b": 2, "c": 6, "d": 0})
    assert not is_valid(s, {"a": 5})
    assert not is_valid(s, {"b": "str"})
    assert not is_valid(s, {"d": -1})


def test_validate_or_raise_formats():
    s = schema(map_(properties={"n": integer(minimum=0)}, required=["n"]))
    assert validate_or_raise(s, {"n": 1}) == {"n": 1}
    with pytest.raises(ValidationError) as exc:
        validate_or_raise(s, {"n": -5})
    assert "/n: minimum" in str(exc.value)
    txt = format_violations(exc.value.violations)
    assert "minimum" in txt


def test_normalize_then_validate_chain(ray_session):
    """§3.3: cast stage feeding the validate stage in one lazy pipeline."""
    import ray.data as rd

    from xema_ray.stages.cast import normalize_dataset
    from xema_ray.stages.validate import validate_dataset

    s = schema(map_(
        properties={
            "n": integer(minimum=0),
            "name": string(min_length=1),
        },
        required=["n", "name"],
    ))
    ds = rd.from_arrow(pa.table({
        "n": pa.array(["3", "-1", "7"]),       # strings → cast to int
        "name": pa.array(["a", "b", None]),
    }))
    normalized = normalize_dataset(ds, s)
    res = validate_dataset(normalized, s, concurrency=1)
    verdict = res.verdict()
    assert verdict["rows"] == 3
    assert verdict["invalid_rows"] == 2  # -1 fails minimum; null name fails required
    kws = {v["keyword"] for v in res.violations().take_all()}
    assert kws == {"minimum", "required"}
