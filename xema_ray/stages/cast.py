"""Normalize stage — the vectorized, Dataset-level form of the cast
operators (SURVEY.md §2.2, §3.3): a projection ``map_batches`` that casts /
fills columns toward the schema BEFORE the validate stage.

Vectorized per column: string→integer/float/number (full-parse guarded,
unparseable cells raise or null out per ``on_error``), number→string,
"true"/"false"→bool, int→float, defaults via ``fill_null``,
``additional_properties: delete`` as a column projection.  Columns whose
sub-schema needs conversions Arrow can't express fall back to the scalar
:mod:`xema_ray.functions.cast` per row.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.cast import CastError, _full_float, _full_int
from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode

# RE2 (pc.match_substring_regex) forms of the Elixir full-parse grammars in
# functions/cast.py — Arrow's own string→number cast is BOTH too liberal
# ("inf"/"nan"/"5."/".5" parse) and too strict ("+5" → int rejects), so every
# cell is gated on the engine grammar before the vectorized cast.
_INT_FULL = r"^[+-]?[0-9]+$"
_FLOAT_FULL = r"^[+-]?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _target_type(node: SchemaNode):
    t = (node.types or ("any",))[0]
    return {
        "integer": pa.int64(),
        "float": pa.float64(),
        "number": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
    }.get(t)


def _cast_column(col: pa.ChunkedArray, node: SchemaNode, name: str, on_error: str):
    target = _target_type(node)
    cur = col.type
    t = (node.types or ("any",))[0]
    if target is None or cur == target:
        return col
    if t in ("integer", "float", "number") and (
        pa.types.is_string(cur) or pa.types.is_large_string(cur)
    ):
        # full-parse requirement (castable/helper.ex:31-43): gate every cell
        # on the Elixir grammar, then cast the survivors vectorized
        pat = _INT_FULL if t == "integer" else _FLOAT_FULL
        ok = pc.or_(pc.match_substring_regex(col, pat), pc.is_null(col))
        if bool(pc.any(pc.invert(ok)).as_py()):
            if on_error != "null":
                bad = col.filter(pc.invert(ok))
                raise CastError((name,), t, f"unparseable cell {bad[0].as_py()!r}")
            col = pc.if_else(ok, col, pa.scalar(None, type=cur))
        if t == "integer":
            # Arrow's int parser rejects the leading '+' the grammar allows
            col = pc.replace_substring_regex(col, r"^\+", "")
        try:
            return pc.cast(col, target)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
            # grammar-valid but uncastable (int64 overflow): per-cell salvage
            parse = _full_int if t == "integer" else _full_float
            out = [None if v is None else parse(v) for v in col.to_pylist()]
            if on_error == "null":
                ok_vals = [v if isinstance(v, (int, float))
                           and -(2**63) <= v < 2**63 else None for v in out] \
                    if t == "integer" else out
                return pa.chunked_array([pa.array(ok_vals, type=target)])
            raise CastError((name,), t, str(e)) from e
    if t in ("float", "number") and pa.types.is_integer(cur):
        return pc.cast(col, pa.float64())
    if t == "integer" and pa.types.is_floating(cur):
        # float→integer is NOT a Xema cast (castable.ex:138-155): keep as-is,
        # validation will apply the like-integer rule
        return col
    if t == "string" and (pa.types.is_integer(cur) or pa.types.is_floating(cur)):
        return pc.cast(col, pa.string())
    if t == "boolean" and (pa.types.is_string(cur) or pa.types.is_large_string(cur)):
        true_mask = pc.equal(col, "true")
        false_mask = pc.equal(col, "false")
        ok = pc.or_(pc.or_(true_mask, false_mask), pc.is_null(col))
        bad = pc.any(pc.invert(ok)).as_py()
        if bad:
            if on_error == "null":
                return pc.if_else(pc.or_(true_mask, false_mask), true_mask,
                                  pa.nulls(len(col), pa.bool_()))
            raise CastError((name,), "boolean", "non-'true'/'false' string")
        return pc.if_else(true_mask, True, pc.if_else(false_mask, False,
                                                      pa.nulls(len(col), pa.bool_())))
    return col


def make_normalizer(schema: CompiledSchema, on_error: str = "raise",
                    additional_properties: Optional[str] = None):
    """Batch fn casting each column toward its property schema; fills
    scalar defaults; optionally drops undeclared columns."""
    root = schema.root

    def fn(tbl: pa.Table) -> pa.Table:
        cols = {}
        declared = root.properties or {}
        for name in tbl.column_names:
            col = tbl[name]
            node = declared.get(name)
            if node is None and root.pattern_props_re:
                for regex, sub in root.pattern_props_re:
                    if regex.search(name):
                        node = sub
                        break
            if node is None:
                if additional_properties == "delete" and root.additional_properties is False:
                    continue  # strip undeclared column (xema.ex:1007-1019)
                cols[name] = col
                continue
            col = _cast_column(col, node, name, on_error)
            if node.default is not UNSET and not callable(node.default):
                col = pc.fill_null(col, node.default)
            cols[name] = col
        # add entirely-missing defaulted columns
        for name, node in declared.items():
            if name not in cols and node.default is not UNSET and not callable(node.default):
                target = _target_type(node) or pa.string()
                cols[name] = pa.chunked_array([
                    pa.array([node.default] * tbl.num_rows, type=target)
                ])
        return pa.table(cols)

    return fn


def normalize_dataset(ds, schema: CompiledSchema, on_error: str = "raise",
                      additional_properties: Optional[str] = None):
    """The normalize stage: ``ds.map_batches(cast-projection)`` (stateless
    tasks — no per-actor state needed)."""
    return ds.map_batches(
        make_normalizer(schema, on_error, additional_properties),
        batch_format="pyarrow",
    )
