"""The reference's ENTIRE generated conformance corpus (drafts 4/6/7 +
optional, ~2,300 cases machine-extracted from
/root/reference/test/json_schema_test_suite by tests/suite_port.py), run
through from_json_schema + the scalar validator.  100 % must pass —
0 tolerated mismatches (parity claim of COVERAGE.md)."""

import pytest

from suite_port import load_cases
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.json_schema import from_json_schema


@pytest.mark.parametrize("draft", ["draft4", "draft6", "draft7"])
def test_reference_conformance_corpus(draft):
    failures = []
    n = 0
    for cid, d, schema, data, expected in load_cases(drafts=(draft,),
                                                     include_optional=True):
        n += 1
        try:
            compiled = from_json_schema(schema, draft=d, validate=False)
            got = is_valid(compiled, data)
        except Exception as e:  # compile errors are failures too
            failures.append(f"{cid}: ERROR {e!r}")
            continue
        if got != expected:
            failures.append(f"{cid}: got {got}, expected {expected} "
                            f"(schema={schema!r:.120}, data={data!r:.80})")
    assert n > 500, f"suite extraction broke: only {n} cases for {draft}"
    assert not failures, f"{len(failures)}/{n} failed:\n" + "\n".join(failures[:20])
