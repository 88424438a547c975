"""Per-keyword error-message parity: every ``Exception.message`` string
asserted in the reference's hand-written suites must be reproduced
byte-for-byte by :func:`xema_ray.functions.messages.validation_message`
(the port of lib/xema/validation_error.ex:121-411)."""

import pytest

from tests.handwritten_port import load_cases
from xema_ray.functions.messages import (
    elixir_inspect,
    validation_message,
)
from xema_ray.functions.scalar import Atom
from xema_ray.schema.builder import compile_schema

CASES = [
    (c, src, val) for c, src, val in load_cases()[0]
    if c.message and c.op == "validate"
    and "#{" not in c.message  # uninterpolated Elixir string interpolation
]

MIN_CASES = 210  # r2: +30 fail-mode (opt_fail) messages


def test_message_volume():
    assert len(CASES) >= MIN_CASES


@pytest.mark.parametrize(
    "i", range(len(CASES)),
    ids=[f"{c.file.removesuffix('_test.exs')}:{i}" for i, (c, _, _) in enumerate(CASES)],
)
def test_reference_message(i):
    c, src, val = CASES[i]
    got = validation_message(compile_schema(src), val,
                             fail=c.fail_mode or "early")
    assert got == c.message, (
        f"{c.file} / {c.describe} / {c.test}\n"
        f"  want: {c.message!r}\n  got:  {got!r}"
    )


def test_valid_value_has_no_message():
    assert validation_message(compile_schema("integer"), 5) is None


@pytest.mark.parametrize("value,expect", [
    (Atom("foo"), ":foo"),
    (Atom("nil"), "nil"),
    (Atom("with space"), ':"with space"'),
    (True, "true"),
    (None, "nil"),
    ("s", '"s"'),
    (2.0, "2.0"),
    ((1, "a"), '{1, "a"}'),
    ([(Atom("a"), 1)], "[a: 1]"),
    ({Atom("b"): 2, Atom("a"): 1}, "%{a: 1, b: 2}"),
    ({"k": 1}, '%{"k" => 1}'),
])
def test_elixir_inspect(value, expect):
    assert elixir_inspect(value) == expect


def test_format_error_direct_cases():
    """validation_error_test.exs format_error/1: direct reason-tree
    rendering matches byte-for-byte."""
    s = compile_schema("integer")
    assert validation_message(s, "foo") == 'Expected :integer, got "foo".'

    s2 = compile_schema(("list", {"items": "integer"}))
    assert validation_message(s2, [1, "foo", 2, Atom("bar")]) == (
        'Expected :integer, got "foo", at [1].\n'
        "Expected :integer, got :bar, at [3]."
    )


def test_format_error_unexpected_reason():
    from xema_ray.functions.messages import format_error

    # validation_error_test.exs exception/1: unknown reason shapes render
    # the "Unexpected error" fallback instead of crashing
    assert format_error({"bogus_keyword": 1}) == "Unexpected error."
