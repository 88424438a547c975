"""The reference's ENTIRE generated conformance corpus (drafts 4/6/7 +
optional, ~2,300 cases machine-extracted from
/root/reference/test/json_schema_test_suite by tests/suite_port.py), run
through from_json_schema + the scalar validator.  100 % must pass —
0 tolerated mismatches (parity claim of COVERAGE.md)."""

import pytest

from suite_port import load_cases
from xema_ray.functions.scalar import is_valid
from xema_ray.schema.json_schema import from_json_schema


def _arrow_type_for(values):
    import pyarrow as pa

    non_null = [v for v in values if v is not None]
    if not non_null:
        return None
    kinds = {type(v) for v in non_null}
    if kinds == {bool}:
        return pa.bool_()
    if kinds <= {int} and all(abs(v) < 2**63 for v in non_null):
        return pa.int64()
    if kinds <= {int, float}:
        if any(isinstance(v, float) for v in non_null) and kinds == {float}:
            return pa.float64()
        return None  # mixed int/float column would coerce and change semantics
    if kinds == {str}:
        return pa.string()
    if kinds == {list}:
        elems = [e for v in non_null for e in v]
        if all(isinstance(e, int) and not isinstance(e, bool)
               and abs(e) < 2**31 for e in elems):
            return pa.list_(pa.int32())
    return None


def test_reference_corpus_through_vectorized_kernels():
    """The same corpus drives the BATCH KERNELS (north_star: 'test-suite
    semantics ported as pytest oracles' for the vectorized path): every
    case whose data fits a typed Arrow column is evaluated as a 1-row
    table through compile_table_plan/evaluate_batch."""
    import pyarrow as pa

    from xema_ray.functions.kernels import compile_table_plan, evaluate_batch
    from xema_ray.schema.builder import compile_schema

    checked = 0
    pure_vector = 0
    failures = []
    for cid, draft, schema, data, expected in load_cases(include_optional=True):
        at = _arrow_type_for([data])
        if at is None:
            continue
        try:
            table_schema = compile_schema({"properties": {"x": schema}})
        except Exception:
            continue
        tbl = pa.table({"x": pa.array([data], type=at)})
        plan = compile_table_plan(table_schema, tbl.schema)
        if all(cp.fallback_node is None for cp in plan.column_plans):
            pure_vector += 1
        valid, _ = evaluate_batch(plan, tbl)
        if bool(valid[0]) != expected:
            failures.append(f"{cid}: kernel={bool(valid[0])} expected={expected} "
                            f"schema={schema!r:.100} data={data!r:.60}")
        checked += 1
    assert checked > 800, f"only {checked} kernel-evaluable cases"
    # r2 floor: nested-combinator vectorization lifted this 1173 -> 1187;
    # r3: physical-type keyword stripping (_effective_node) -> 1274;
    # r4: list-column const/enum (===-equality via _list_const_mask),
    # additional_items gate, static type-union resolution for list
    # columns and col_type-aware combinator branches -> ALL 1322
    # kernel-evaluable cases run pure-vector (zero scalar residue)
    assert pure_vector == checked, \
        f"pure-vector case count regressed: {pure_vector}/{checked}"
    assert not failures, f"{len(failures)}/{checked}:\n" + "\n".join(failures[:15])


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
