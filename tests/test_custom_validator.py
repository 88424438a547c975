"""Custom validator hooks through the declarative API — the port of
test/xema/custom_validator_test.exs (validator: {Mod, :fun} / behaviour
modules / capture functions become plain Python callables returning
None | error-name)."""

import pytest

from xema_ray.functions.errors import ValidationError
from xema_ray.functions.messages import validation_message, validation_reason
from xema_ray.functions.scalar import Atom
from xema_ray.schema.builder import compile_schema
from xema_ray.schema.declarative import SchemaModule, xema
from xema_ray.schema.dsl import map_, string

A = Atom


def palindrome(s):
    return None if s == s[::-1] else "no_palindrome"


def three_words(s):
    return None if len(s.split(" ")) == 3 else "not_three_words"


class Schemas(SchemaModule, multi=True):
    strings = xema(map_(properties={
        A("short"): string(max_length=3),
        A("long"): string(min_length=5),
        A("palindrome"): string(validator=palindrome),
        A("three"): string(validator=three_words),
    }))


def test_custom_validator_valid():
    assert Schemas.valid("strings", {
        A("short"): "foo",
        A("long"): "foobar",
        A("palindrome"): "rats live on no evil star",
        A("three"): "one two three",
    })


def test_custom_validator_invalid_reason_and_message():
    bad = {
        A("short"): "foobar",
        A("long"): "foo",
        A("palindrome"): "cats live on no evil star",
        A("three"): "one",
    }
    assert not Schemas.valid("strings", bad)
    r = validation_reason(Schemas.__xemas__["strings"], bad)
    props = r["properties"]
    assert props[A("palindrome")] == {"validator": A("no_palindrome"),
                                      "value": "cats live on no evil star"}
    assert props[A("three")] == {"validator": A("not_three_words"),
                                 "value": "one"}
    msg = validation_message(Schemas.__xemas__["strings"], bad)
    # reference phrasings (validation_error.ex validator clause)
    assert "Validator fails with :no_palindrome for value "
    assert 'Validator fails with :not_three_words for value "one", at [:three].' in msg
    assert 'Expected minimum length of 5, got "foo", at [:long].' in msg


def test_custom_validator_runs_after_keyword_chain():
    # chain order: the validator group is LAST — a value failing both
    # min_length and the validator reports min_length under fail=early
    s = compile_schema(("string", {"min_length": 5, "validator": three_words}))
    r = validation_reason(s, "ab")
    assert "min_length" in r
    r_fin = validation_reason(s, "ab", fail="finally")
    kws = [next(iter(g)) for g in (r_fin if isinstance(r_fin, list) else [r_fin])]
    assert "validator" in kws and "min_length" in kws
