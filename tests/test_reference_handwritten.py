"""The reference's HAND-WRITTEN ExUnit suites — validation AND cast —
machine-ported by tests/handwritten_port.py (Elixir-DSL term extraction;
test data only, no code translation).

Every extracted case must reproduce the reference's verdict: validate
cases through the scalar validator (exact fail-mode), cast cases through
``cast/3`` comparing the converted value with Elixir ``===`` semantics
(strict_eq).  Zero tolerated mismatches.
"""

import pytest

from tests.handwritten_port import NO_EXPECTED, load_cases
from xema_ray.functions.cast import CastError, cast
from xema_ray.functions.scalar import strict_eq, validate_value
from xema_ray.schema.builder import compile_schema

CASES, NOTES = load_cases()

# sanity floor: the extractor must keep finding the corpus (guards against
# silent extraction regressions)
MIN_CASES = 950


def test_extraction_volume():
    assert len(CASES) >= MIN_CASES, (
        f"extractor found only {len(CASES)} cases (floor {MIN_CASES}); "
        f"first skips: {[f'{n.file}:{n.where}' for n in NOTES[:5]]}"
    )


def _kw_sorted(x):
    """Keyword lists cast from (unordered Erlang) maps compare order-
    insensitively; everything else compares exactly."""
    if isinstance(x, list) and all(
        isinstance(e, tuple) and len(e) == 2 for e in x
    ):
        try:
            return sorted(x, key=lambda e: str(e[0]))
        except Exception:
            return x
    return x


def _ids():
    out = []
    for i, (c, _, _) in enumerate(CASES):
        tag = c.file.removesuffix("_test.exs").replace("/", "-")
        out.append(f"{tag}:{i}:{c.test[:28]}")
    return out


@pytest.mark.parametrize("case", range(len(CASES)), ids=_ids())
def test_handwritten_case(case):
    c, src, val = CASES[case]
    schema = compile_schema(src)
    ctx = f"{c.file} / {c.describe} / {c.test}\n  schema={src!r}\n  value={val!r}"

    if c.op == "validate":
        got = not validate_value(schema, val, fail=c.fail_mode or "early")
        assert got == c.expect_valid, (
            f"{ctx}: got {got}, reference expects {c.expect_valid}")
        return

    # cast
    try:
        out, viols = cast(schema, val, additional_properties=c.ap_opt)
    except CastError as e:
        assert c.expect_error in ("cast", "any"), (
            f"{ctx}: unexpected CastError {e}")
        return
    if c.expect_error == "cast":
        pytest.fail(f"{ctx}: expected CastError, got {out!r}")
    elif c.expect_error in ("validation", "any"):
        assert viols, f"{ctx}: expected validation failure, got {out!r}"
    elif c.expected_term is NO_EXPECTED:
        assert not viols, f"{ctx}: unexpected violations {viols[:2]!r}"
    else:
        assert not viols, f"{ctx}: unexpected violations {viols[:2]!r}"
        assert strict_eq(out, c.expected_term) or strict_eq(
            _kw_sorted(out), _kw_sorted(c.expected_term)
        ), f"{ctx}: cast to {out!r}, reference expects {c.expected_term!r}"
