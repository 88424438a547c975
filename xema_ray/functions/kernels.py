"""Vectorized Arrow kernels — per-column validation plans.

Compiles a :class:`CompiledSchema` whose root is a map/object schema (table =
map, columns = properties, SURVEY.md §1.3) into a :class:`TablePlan` of
vectorized checks.  Each check is a closure ``pa.Array -> ok_mask`` built from
``pyarrow.compute`` / numpy kernels — never a Python loop over rows — with a
per-row scalar fallback (:mod:`xema_ray.functions.scalar`) for sub-schemas the
vector layer can't express (nested combinators, circular refs, custom per-value
validators).  Null cells count as "property absent": every keyword check passes
on null (reference validator.ex:846-848) except ``required``
(validator.ex:861-875 — presence = non-null).

The plan is pure-Python, pickleable, and built ONCE (driver or actor
``__init__``) — the analogue of Xema's compile-once/validate-many
(behaviour.ex:58-75).  Per batch it produces a row ``valid`` mask plus
violation arrays ``(row_index, path, keyword, message)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions import formats as fmt
from xema_ray.functions.scalar import validate_value
from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode
from xema_ray.schema.builder import resolve_pointer

# ----------------------------------------------------------------------
# check result containers
# ----------------------------------------------------------------------


@dataclass
class CheckViolations:
    """Violations from one check over one batch (columnar, not per-row)."""

    row_idx: np.ndarray  # int64 row indices into the batch
    keyword: str
    paths: Any  # str (constant for all rows) or np.ndarray of str
    message: str


@dataclass
class _Check:
    keyword: str
    # fn(col: pa.Array, tbl: pa.Table) -> np.ndarray[bool] ok-mask, or
    # (ok_mask, CheckViolations) for element-level checks
    fn: Callable
    message: str
    path: str
    # optional numpy fast path: np_fn(vals: np.ndarray) -> bool mask; used by
    # the list-element evaluator on null-free value buffers (zero-copy)
    np_fn: Optional[Callable] = None


@dataclass
class ColumnPlan:
    name: str
    checks: list = field(default_factory=list)
    # scalar fallback: validate each non-null value of this column per row
    fallback_node: Optional[SchemaNode] = None
    fallback_compiled: Optional[CompiledSchema] = None
    # reference fail=:finally chain shape (validator.ex:121-169): list- and
    # map-typed values COLLECT every failing keyword group; scalar chains
    # (string/number, validator.ex:110-117/201-208) abort at the first
    # failing keyword even under :finally
    collect_kind: bool = False


@dataclass
class TableCheck:
    """Cross-column vectorized UDF hook — the batch-level analogue of Xema's
    custom ``validator`` keyword (reference validator.ex:1019-1041)."""

    keyword: str
    fn: Callable  # fn(tbl: pa.Table) -> np.ndarray[bool] ok mask
    path: str
    message: str


@dataclass
class TablePlan:
    column_plans: list
    required: list  # column names that must be non-null per row
    missing_required: list  # required columns absent from the table schema
    unexpected_columns: list  # additionalProperties: false violations
    table_checks: list = field(default_factory=list)
    # vectorized root-level checks: dependencies (list form), min/max_properties
    root_checks: list = field(default_factory=list)
    # residual root keywords (combinators, schema-form dependencies, const,
    # enum, custom validator at the MAP level) → per-row dict fallback
    root_fallback: Optional[CompiledSchema] = None

    def describe(self) -> str:
        lines = []
        for cp in self.column_plans:
            kinds = [c.keyword for c in cp.checks]
            if cp.fallback_node is not None:
                kinds.append("scalar-fallback")
            lines.append(f"{cp.name}: {', '.join(kinds) or 'no-op'}")
        if self.required:
            lines.append(f"required: {self.required}")
        return "\n".join(lines)


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

_COMBINATOR_SLOTS = {"not_", "all_of", "any_of", "one_of", "if_", "then", "else_"}

_VECTOR_SAFE_SLOTS = {
    "types", "bool_schema", "const", "enum", "minimum", "maximum",
    "exclusive_minimum", "exclusive_maximum", "multiple_of", "min_length",
    "max_length", "pattern", "pattern_re", "format", "min_items", "max_items",
    "unique_items", "items", "additional_items", "contains", "ref",
}


def _np_bool(mask) -> np.ndarray:
    if isinstance(mask, np.ndarray):
        return mask
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool)


def _ok_with_nulls(result, col: pa.Array) -> np.ndarray:
    """Kleene-fill: null cells pass every keyword check."""
    ok = pc.fill_null(result, True)
    return _np_bool(ok)


def _is_vectorizable(node: SchemaNode, compiled: CompiledSchema, depth: int = 0,
                     seen: Optional[frozenset] = None, col_type=None) -> bool:
    """Can this node be fully expressed with vector checks on one column?

    r3: the former depth-3 combinator bound is lifted — the mask-algebra
    evaluators (:func:`_build_combinator_checks` → ``_branch_evaluators``)
    recurse to arbitrary depth, so the gate only needs cycle safety
    (``seen`` id-set for ref loops) plus a generous sanity bound."""
    if depth > 32:
        return False
    seen = seen or frozenset()
    if id(node) in seen:
        return False  # circular ref chain — scalar fallback handles it
    seen = seen | {id(node)}
    if node.bool_schema is not None:
        return True
    if node.ref is not None:
        try:
            target = resolve_pointer(compiled, node.ref)
        except KeyError:
            return False
        if target is node:
            return False
        return _is_vectorizable(target, compiled, depth + 1, seen, col_type)
    for slot in node.keywords_present():
        if slot == "validator":
            return False
        if slot in _COMBINATOR_SLOTS:
            if not _combinator_branches_vectorizable(node, compiled, seen=seen,
                                                     col_type=col_type):
                return False
            continue
        if slot not in _VECTOR_SAFE_SLOTS:
            return False
    if node.types and any(t in ("map", "keyword", "struct", "tuple", "atom") for t in node.types):
        # a struct/map column could actually BE one of these; a primitive
        # OR LIST column cannot (an Arrow list is the reference's :list,
        # never a map/tuple/atom) — its union-type kernel statically
        # fails the impossible members, so the gate passes it through
        # (r4: list columns were conservatively bounced here)
        if col_type is None or pa.types.is_struct(col_type) \
                or pa.types.is_map(col_type):
            return False
    if isinstance(node.items, list):
        for s in node.items:
            s = _deref(s, compiled)
            if s.bool_schema is None and not _is_scalar_vectorizable(s, compiled):
                return False
        ai = node.additional_items
        if isinstance(ai, SchemaNode) and not _is_scalar_vectorizable(_deref(ai, compiled), compiled):
            return False
    if isinstance(node.items, SchemaNode) and not _is_scalar_vectorizable(node.items, compiled):
        return False
    if node.contains is not None and not _is_scalar_vectorizable(node.contains, compiled):
        return False
    return True


def _is_scalar_vectorizable(node: SchemaNode, compiled: CompiledSchema,
                            depth: int = 0,
                            seen: Optional[frozenset] = None,
                            col_type=None) -> bool:
    """Element sub-schema: scalar-only keyword set (no nested lists/maps).
    Combinators nest to arbitrary depth (each level is one round of mask
    algebra, ``_build_combinator_checks`` → ``_branch_evaluators`` →
    ``_build_scalar_checks``); the gate guards ref cycles via ``seen``.

    ``col_type`` (r4): when the physical column type is known and is not
    a struct/map, branch keywords that can never apply to it are
    stripped (``_effective_node``) and non-primitive ``type`` members
    are allowed through — the type kernel statically fails them — so
    ``not``/``anyOf`` branches mentioning objects vectorize over
    primitive and list columns."""
    if depth > 32:
        return False
    seen = seen or frozenset()
    if id(node) in seen:
        return False
    seen = seen | {id(node)}
    if node.bool_schema is not None:
        return True
    if node.ref is not None:
        try:
            target = resolve_pointer(compiled, node.ref)
        except KeyError:
            return False
        return target is not node and _is_scalar_vectorizable(
            target, compiled, depth + 1, seen, col_type)
    typed_scalar_col = col_type is not None and not (
        pa.types.is_struct(col_type) or pa.types.is_map(col_type))
    if typed_scalar_col:
        node = _effective_node(node, col_type)
    for slot in node.keywords_present():
        if slot in ("items", "contains", "min_items", "max_items", "unique_items", "validator"):
            return False
        if slot in _COMBINATOR_SLOTS:
            if not _combinator_branches_vectorizable(node, compiled,
                                                     depth=depth, seen=seen,
                                                     col_type=col_type):
                return False
            continue
        if slot not in _VECTOR_SAFE_SLOTS:
            return False
    if node.types and any(t not in ("integer", "float", "number", "string", "boolean", "nil", "any") for t in node.types):
        if not typed_scalar_col:
            return False
    return True


def _combinator_branches_vectorizable(node: SchemaNode, compiled,
                                      depth: int = 0,
                                      seen: Optional[frozenset] = None,
                                      col_type=None) -> bool:
    """Every combinator branch must be scalar-vectorizable; branches may
    carry their OWN combinators to arbitrary depth (each level is a
    recursive mask-algebra evaluator; ``seen`` breaks ref cycles)."""
    if depth > 32:
        return False
    for b in _combinator_branches(node):
        b = _deref(b, compiled)
        if b.bool_schema is not None:
            continue
        if not _is_scalar_vectorizable(b, compiled, depth=depth + 1,
                                       seen=seen, col_type=col_type):
            return False
    return True


def _combinator_branches(node: SchemaNode):
    for slot in ("not_", "if_", "then", "else_"):
        v = getattr(node, slot)
        if v is not None:
            yield v
    for slot in ("all_of", "any_of", "one_of"):
        v = getattr(node, slot)
        if v:
            yield from v


def _is_map_like(node: SchemaNode) -> bool:
    """Node describes an object/map (types say so, or it only uses map
    keywords) with no per-value keywords a struct column can't express."""
    if node.bool_schema is not None:
        return False
    if node.types and not set(node.types) <= {"map", "struct", "any"}:
        return False
    map_kw = {"properties", "required", "additional_properties",
              "pattern_properties", "property_names", "min_properties",
              "max_properties", "dependencies", "module", "keys"}
    combo_or_residual = {"not_", "all_of", "any_of", "one_of", "if_", "then",
                         "else_", "const", "enum", "validator", "ref"}
    present = set(node.keywords_present())
    if present & combo_or_residual:
        return False  # residual map-level keywords → row fallback
    return bool(present & map_kw)


_MAP_ONLY_SLOTS = ("properties", "required", "additional_properties",
                   "pattern_properties", "property_names", "min_properties",
                   "max_properties", "dependencies", "keys", "module")
_LIST_ONLY_SLOTS = ("items", "additional_items", "min_items", "max_items",
                    "unique_items", "contains")


def _effective_node(node: SchemaNode, col_type) -> SchemaNode:
    """Strip keyword groups that can NEVER apply to values of this
    physical column type (r3): the reference dispatches keyword groups on
    the VALUE's runtime type (validator.ex:99-208), so map keywords are
    no-ops for an int64 column and list keywords are no-ops for a string
    column.  The ``type`` keyword itself is untouched — the union type
    kernel already fails impossible members.  Lifts map-keyword schemas
    over primitive columns onto the pure-vector path."""
    if node.bool_schema is not None or node.ref is not None:
        return node
    import dataclasses

    nested_map = pa.types.is_struct(col_type) or pa.types.is_map(col_type)
    nested_list = (pa.types.is_list(col_type) or pa.types.is_large_list(col_type)
                   or pa.types.is_fixed_size_list(col_type))
    drop = {}
    if not nested_map:
        for slot in _MAP_ONLY_SLOTS:
            if getattr(node, slot) is not None:
                drop[slot] = None
    if not nested_list:
        for slot in _LIST_ONLY_SLOTS:
            if getattr(node, slot) is not None:
                drop[slot] = None
    if not drop:
        return node
    return dataclasses.replace(node, **drop)


def _deref(node: SchemaNode, compiled: CompiledSchema) -> SchemaNode:
    seen = set()
    while node.ref is not None and id(node) not in seen:
        seen.add(id(node))
        node = resolve_pointer(compiled, node.ref)
    return node


# ----------------------------------------------------------------------
# scalar-column check builders
# ----------------------------------------------------------------------


def _type_check(types: tuple, col_type: pa.DataType, path: str):
    """Plan-time column type reconciliation + residual runtime check.

    Returns (static_ok: Optional[bool], runtime_fn or None).  static_ok=True
    → whole column satisfies the type; False → every non-null cell violates.
    """
    t = types[0]
    if t == "any":
        return True, None
    if t == "integer":
        if pa.types.is_integer(col_type):
            return True, None
        if pa.types.is_floating(col_type):
            # like-integer floats pass (validator.ex:242,250)
            return None, lambda col, tbl: _ok_with_nulls(pc.equal(pc.floor(col), col), col)
        return False, None
    if t == "float":
        return bool(pa.types.is_floating(col_type)), None
    if t == "number":
        return bool(pa.types.is_integer(col_type) or pa.types.is_floating(col_type)), None
    if t == "string":
        return bool(pa.types.is_string(col_type) or pa.types.is_large_string(col_type)), None
    if t == "boolean":
        return bool(pa.types.is_boolean(col_type)), None
    if t == "list":
        return bool(
            pa.types.is_list(col_type)
            or pa.types.is_large_list(col_type)
            or pa.types.is_fixed_size_list(col_type)
        ), None
    if t == "nil":
        if pa.types.is_null(col_type):
            return True, None
        return None, lambda col, tbl: _np_bool(pc.is_null(col))
    return False, None


def _list_const_mask(col, const) -> np.ndarray:
    """ok-mask for ``const``/enum-member equality over a LIST column
    (r4: the former nested-=== scalar-fallback class, vectorized).

    Reference semantics (scalar.strict_eq): STRICT elementwise term
    equality — ints never equal floats inside a list (the numeric
    cross-equality lane applies only when const and value are both
    top-level numbers, scalar.py:_const), booleans never equal numbers,
    null elements equal only nil members, and a list cell never equals
    a non-list constant.  Null CELLS pass (property-absent), mirroring
    every other scalar check."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nulls = _np_bool(pc.is_null(col))
    if not isinstance(const, list):
        return nulls
    vt = col.type.value_type
    elems: list = []
    for e in const:
        if e is None:
            elems.append(None)
        elif isinstance(e, bool):
            if not pa.types.is_boolean(vt):
                return nulls
            elems.append(bool(e))
        elif isinstance(e, int):
            if not pa.types.is_integer(vt):
                return nulls
            elems.append(int(e))
        elif isinstance(e, float):
            if not pa.types.is_floating(vt):
                return nulls
            elems.append(float(e))
        elif isinstance(e, str):
            if not (pa.types.is_string(vt) or pa.types.is_large_string(vt)):
                return nulls
            elems.append(e)
        else:
            return nulls  # nested list/map member can't live in this column
    k = len(elems)
    len_ok = _np_bool(pc.fill_null(
        pc.equal(pc.list_value_length(col), k), False))
    rows = np.nonzero(len_ok & ~nulls)[0]
    if k and len(rows):
        values, offsets = _list_offsets(col)
        starts = offsets[:-1][rows]
        for i, e in enumerate(elems):
            if not len(rows):
                break
            sub = values.take(pa.array(starts + i, type=pa.int64()))
            if e is None:
                m = _np_bool(pc.is_null(sub))
            else:
                target, ev = sub, e
                if pa.types.is_floating(vt):
                    # -0.0 == +0.0 (numeric ==): normalize both sides
                    target = pc.add(sub, 0.0)
                    ev = float(e) + 0.0
                m = _np_bool(pc.fill_null(pc.equal(target, ev), False))
            rows, starts = rows[m], starts[m]
    ok = np.zeros(len(col), dtype=bool)
    ok[rows] = True
    return ok | nulls


def _build_scalar_checks(node: SchemaNode, col_type: pa.DataType, path: str,
                         compiled: Optional[CompiledSchema] = None,
                         elem_mode: bool = False) -> list:
    """Vector checks for scalar keywords of ``node`` against a column.

    ``elem_mode`` switches null semantics for combinator checks: column
    cells treat null as property-absent (always passes), list ELEMENTS
    treat null as a value that must satisfy the branch (is_integer(nil)
    is false).
    """
    checks: list = []

    if node.bool_schema is not None:
        if node.bool_schema is False:
            # false schema rejects every present value; null = absent passes
            checks.append(_Check(
                "type", lambda col, tbl: _np_bool(pc.is_null(col)),
                "schema rejects all values", path))
        return checks

    if node.types:
        # union types: the value passes if ANY member type matches
        # (validator.ex:262-268); statically-true member → whole column ok
        static_any = False
        runtimes = []
        for t in node.types:
            s_ok, rt = _type_check((t,), col_type, path)
            if s_ok is True:
                static_any = True
                break
            if rt is not None:
                runtimes.append(rt)
        if not static_any:
            if not runtimes:
                checks.append(_Check(
                    "type",
                    lambda col, tbl: _np_bool(pc.is_null(col)),  # only nulls pass
                    f"expected type {'/'.join(node.types)}", path))
                # nothing else can matter — every non-null cell already fails
                return checks
            def union_rt(col, tbl, runtimes=runtimes):
                m = np.zeros(len(col), dtype=bool)
                for rt in runtimes:
                    m |= rt(col, tbl)
                return m
            checks.append(_Check("type", union_rt,
                                 f"expected type {'/'.join(node.types)}", path))

    is_list_col = (pa.types.is_list(col_type) or pa.types.is_large_list(col_type)
                   or pa.types.is_fixed_size_list(col_type))

    if node.const is not UNSET:
        const = node.const
        if is_list_col:
            # structural ===-equality against a literal list (r4): the
            # former scalar-fallback class
            checks.append(_Check(
                "const",
                lambda col, tbl, const=const: _list_const_mask(col, const),
                f"expected const {node.const!r}", path))
        else:
            def const_fn(col, tbl, const=const):
                if const is None:
                    return _np_bool(pc.is_null(col))
                try:
                    return _ok_with_nulls(pc.equal(col, pa.scalar(const)), col)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    return _np_bool(pc.is_null(col))  # type-incompatible const
            checks.append(_Check("const", const_fn, f"expected const {node.const!r}", path))

    if node.enum is not None and is_list_col:
        members = node.enum

        def list_enum_fn(col, tbl, members=members):
            # a list cell can only === a LIST member; each member mask
            # already includes the null-passes lane
            masks = [_list_const_mask(col, m) for m in members
                     if isinstance(m, list)]
            if not masks:
                return _np_bool(pc.is_null(col))
            out = masks[0]
            for m in masks[1:]:
                out = out | m
            return out
        checks.append(_Check("enum", list_enum_fn,
                             f"not in enum {node.enum!r}", path))
    elif node.enum is not None:
        members = node.enum
        def enum_fn(col, tbl, members=members):
            # strict membership plus int↔zero-fraction-float cross-equality
            # (validator.ex:346-376); over a typed Arrow column the numeric
            # members collapse into the column type when castable.
            compat = []
            for m in members:
                if isinstance(m, bool):
                    if pa.types.is_boolean(col.type):
                        compat.append(m)
                    continue
                if isinstance(m, (int, float)):
                    if pa.types.is_integer(col.type):
                        if float(m) == int(m):
                            compat.append(int(m))
                    elif pa.types.is_floating(col.type):
                        compat.append(float(m))
                    continue
                if isinstance(m, str) and (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                    compat.append(m)
            if not compat:
                return _np_bool(pc.is_null(col))
            try:
                value_set = pa.array(compat, type=col.type)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                value_set = pa.array(compat)
            probe = col
            if pa.types.is_floating(col.type):
                # is_in matches bitwise: normalize -0.0 → +0.0 on both sides
                # (numeric == semantics, validator.ex:346-376)
                probe = pc.add(col, 0.0)
                value_set = pc.add(value_set, 0.0)
            # is_in yields False (not null) for null cells — OR the null mask
            # back in so null = property-absent passes
            return _np_bool(pc.or_(pc.is_in(probe, value_set=value_set), pc.is_null(col)))
        checks.append(_Check("enum", enum_fn, f"not in enum {node.enum!r}", path))

    is_num_col = pa.types.is_integer(col_type) or pa.types.is_floating(col_type)

    if node.minimum is not None and is_num_col:
        m, excl = node.minimum, node.exclusive_minimum is True
        op = pc.greater if excl else pc.greater_equal
        npop = np.greater if excl else np.greater_equal
        checks.append(_Check(
            "minimum",
            lambda col, tbl, op=op, m=m: _ok_with_nulls(op(col, m), col),
            f"expected {'>' if excl else '>='} {m}", path,
            np_fn=lambda vals, npop=npop, m=m: npop(vals, m)))
    if node.maximum is not None and is_num_col:
        m, excl = node.maximum, node.exclusive_maximum is True
        op = pc.less if excl else pc.less_equal
        npop = np.less if excl else np.less_equal
        checks.append(_Check(
            "maximum",
            lambda col, tbl, op=op, m=m: _ok_with_nulls(op(col, m), col),
            f"expected {'<' if excl else '<='} {m}", path,
            np_fn=lambda vals, npop=npop, m=m: npop(vals, m)))
    if node.exclusive_minimum is not None and is_num_col and not isinstance(node.exclusive_minimum, bool):
        m = node.exclusive_minimum
        checks.append(_Check(
            "exclusive_minimum",
            lambda col, tbl, m=m: _ok_with_nulls(pc.greater(col, m), col),
            f"expected > {m}", path,
            np_fn=lambda vals, m=m: np.greater(vals, m)))
    if node.exclusive_maximum is not None and is_num_col and not isinstance(node.exclusive_maximum, bool):
        m = node.exclusive_maximum
        checks.append(_Check(
            "exclusive_maximum",
            lambda col, tbl, m=m: _ok_with_nulls(pc.less(col, m), col),
            f"expected < {m}", path,
            np_fn=lambda vals, m=m: np.less(vals, m)))

    if node.multiple_of is not None and is_num_col:
        m = node.multiple_of
        def mult_fn(col, tbl, m=m):
            if pa.types.is_integer(col.type) and isinstance(m, int):
                # bit-exact for ints; (v/m) - floor(v/m) == 0 in the reference
                vals = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                np_vals = vals.to_numpy(zero_copy_only=False)
                ok = np.zeros(len(np_vals), dtype=bool)
                valid = ~pc.is_null(vals).to_numpy(zero_copy_only=False)
                v = np.where(valid, np_vals, 0).astype(np.int64)
                ok[:] = (v % m) == 0
                ok[~valid] = True
                return ok
            x = pc.divide(pc.cast(col, pa.float64()), float(m))
            return _ok_with_nulls(pc.equal(pc.floor(x), x), col)
        checks.append(_Check("multiple_of", mult_fn, f"not a multiple of {m}", path))

    is_str_col = pa.types.is_string(col_type) or pa.types.is_large_string(col_type)
    if node.min_length is not None and is_str_col:
        n = node.min_length
        checks.append(_Check(
            "min_length",
            lambda col, tbl, n=n: _length_mask(col, n, "ge"),
            f"length < {n}", path))
    if node.max_length is not None and is_str_col:
        n = node.max_length
        checks.append(_Check(
            "max_length",
            lambda col, tbl, n=n: _length_mask(col, n, "le"),
            f"length > {n}", path))

    if node.pattern is not None and is_str_col:
        pat = node.pattern
        def pattern_fn(col, tbl, pat=pat):
            try:
                return _ok_with_nulls(pc.match_substring_regex(col, pat), col)
            except pa.ArrowInvalid:
                # RE2-incompatible pattern (lookarounds etc.) → Python re
                return _regex_fallback(col, pat)
        checks.append(_Check("pattern", pattern_fn, f"does not match /{node.pattern}/", path))

    if node.format is not None and is_str_col:
        name = fmt.normalize_format(node.format)
        if name in fmt.CHECKERS:
            checks.append(_Check(
                "format",
                lambda col, tbl, name=name: _format_mask(col, name),
                f"not a valid {name}", path))

    checks.extend(_build_combinator_checks(node, col_type, path, compiled, elem_mode))

    return checks


def _branch_accepts_null(branch: SchemaNode) -> bool:
    if branch.bool_schema is not None:
        return branch.bool_schema
    return not branch.types or bool({"any", "nil"} & set(branch.types))


def _branch_evaluators(branches, col_type, path, compiled):
    """[(arrow_fn, np_fn_or_None)] — per-branch boolean mask evaluators.
    Null cells get the branch's accepts-null verdict (overridden at the
    column level by the final nulls-pass rule)."""
    out = []
    for b in branches:
        b = _deref(b, compiled) if compiled is not None else b
        if b.bool_schema is not None:
            const = bool(b.bool_schema)
            out.append((
                lambda col, const=const: np.full(len(col), const, dtype=bool),
                lambda vals, const=const: np.full(len(vals), const, dtype=bool),
            ))
            continue
        sub_checks = _build_scalar_checks(b, col_type, path, compiled)
        accepts_null = _branch_accepts_null(b)

        def fn(col, sub_checks=sub_checks, accepts_null=accepts_null):
            m = np.ones(len(col), dtype=bool)
            for c in sub_checks:
                r = c.fn(col, None)
                m &= r if isinstance(r, np.ndarray) else np.asarray(r)
            if col.null_count:
                m[_np_bool(pc.is_null(col))] = accepts_null
            return m

        np_fn = None
        if all(c.np_fn is not None for c in sub_checks):
            def np_fn(vals, sub_checks=sub_checks):
                m = np.ones(len(vals), dtype=bool)
                for c in sub_checks:
                    m &= c.np_fn(vals)
                return m
        out.append((fn, np_fn))
    return out


def _build_combinator_checks(node: SchemaNode, col_type, path: str,
                             compiled, elem_mode: bool) -> list:
    """Mask-algebra kernels for not/allOf/anyOf/oneOf/if-then-else over a
    scalar column (SURVEY §2.1 #28-32): branch masks AND/OR/sum/select."""
    checks: list = []

    def finalize(fn_raw, np_raw, keyword, message):
        def fn(col, tbl):
            m = fn_raw(col)
            if not elem_mode and col.null_count:
                m |= _np_bool(pc.is_null(col))  # null = property absent
            return m
        checks.append(_Check(keyword, fn, message, path, np_fn=np_raw))

    if node.not_ is not None:
        (bf, bnp), = _branch_evaluators([node.not_], col_type, path, compiled)
        finalize(lambda col, bf=bf: ~bf(col),
                 (lambda vals, bnp=bnp: ~bnp(vals)) if bnp else None,
                 "not", "value must not match the not-schema")
    if node.all_of:
        evs = _branch_evaluators(node.all_of, col_type, path, compiled)
        def all_raw(col, evs=evs):
            m = np.ones(len(col), dtype=bool)
            for bf, _ in evs:
                m &= bf(col)
            return m
        np_all = None
        if all(bnp is not None for _, bnp in evs):
            def np_all(vals, evs=evs):
                m = np.ones(len(vals), dtype=bool)
                for _, bnp in evs:
                    m &= bnp(vals)
                return m
        finalize(all_raw, np_all, "all_of", "not all sub-schemas match")
    if node.any_of:
        evs = _branch_evaluators(node.any_of, col_type, path, compiled)
        def any_raw(col, evs=evs):
            m = np.zeros(len(col), dtype=bool)
            for bf, _ in evs:
                m |= bf(col)
            return m
        np_any = None
        if all(bnp is not None for _, bnp in evs):
            def np_any(vals, evs=evs):
                m = np.zeros(len(vals), dtype=bool)
                for _, bnp in evs:
                    m |= bnp(vals)
                return m
        finalize(any_raw, np_any, "any_of", "no sub-schema matches")
    if node.one_of:
        evs = _branch_evaluators(node.one_of, col_type, path, compiled)
        def one_raw(col, evs=evs):
            cnt = np.zeros(len(col), dtype=np.int8)
            for bf, _ in evs:
                cnt += bf(col)
            return cnt == 1
        np_one = None
        if all(bnp is not None for _, bnp in evs):
            def np_one(vals, evs=evs):
                cnt = np.zeros(len(vals), dtype=np.int8)
                for _, bnp in evs:
                    cnt += bnp(vals)
                return cnt == 1
        finalize(one_raw, np_one, "one_of", "not exactly one sub-schema matches")
    if node.if_ is not None and (node.then is not None or node.else_ is not None):
        branches = [node.if_,
                    node.then if node.then is not None else True_NODE,
                    node.else_ if node.else_ is not None else True_NODE]
        evs = _branch_evaluators(branches, col_type, path, compiled)
        def ite_raw(col, evs=evs):
            c, t, e = (bf(col) for bf, _ in evs)
            return np.where(c, t, e)
        np_ite = None
        if all(bnp is not None for _, bnp in evs):
            def np_ite(vals, evs=evs):
                c, t, e = (bnp(vals) for _, bnp in evs)
                return np.where(c, t, e)
        finalize(ite_raw, np_ite, "if", "conditional schema fails")
    return checks


#: accept-all node used for absent then/else branches
True_NODE = SchemaNode(bool_schema=True)


def _length_mask(col, n: int, op: str) -> np.ndarray:
    """Grapheme-aware length bound: ASCII rows via utf8_length (code points =
    graphemes), non-ASCII rows via the exact scalar grapheme counter."""
    lengths = pc.utf8_length(col)
    base = pc.greater_equal(lengths, n) if op == "ge" else pc.less_equal(lengths, n)
    ok = _ok_with_nulls(base, col)
    ascii_mask = _np_bool(pc.fill_null(pc.string_is_ascii(col), True))
    if not ascii_mask.all():
        from xema_ray.functions.scalar import grapheme_length
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        for i in np.nonzero(~ascii_mask)[0]:
            v = arr[int(i)].as_py()
            if v is None:
                ok[i] = True
            else:
                glen = grapheme_length(v)
                ok[i] = glen >= n if op == "ge" else glen <= n
    return ok


def _regex_fallback(col, pat: str) -> np.ndarray:
    import re

    rx = re.compile(pat)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    out = np.ones(len(arr), dtype=bool)
    for i, v in enumerate(arr.to_pylist()):
        if v is not None:
            out[i] = rx.search(v) is not None
    return out


# anchored RE2-safe prefilters for the pure-regex formats; calendar formats
# verify matches in Python (format.ex:88-145 does a real calendar check)
_RE2_FORMAT_PATTERNS = {
    "ipv4": fmt.IPV4_RE.pattern,
    "ipv6": fmt.IPV6_RE.pattern,
    "hostname": fmt.HOSTNAME_RE.pattern,
    "json_pointer": fmt.JSON_POINTER_RE.pattern,
    "uri_userinfo": fmt.URI_USERINFO_RE.pattern,
    "uri_query": fmt.URI_QUERY_RE.pattern,
    "uri_fragment": fmt.URI_QUERY_RE.pattern,
    "uri_path": fmt.URI_PATH_RE.pattern,
}


def _format_mask(col, name: str) -> np.ndarray:
    checker = fmt.CHECKERS[name]
    pattern = _RE2_FORMAT_PATTERNS.get(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if pattern is not None:
        extra = r"(?i)" if name == "hostname" else ""
        try:
            ok = _ok_with_nulls(pc.match_substring_regex(arr, extra + pattern), arr)
            if name in ("hostname",):
                ends_dash = _np_bool(pc.fill_null(pc.ends_with(arr, pattern="-"), False))
                ok &= ~ends_dash
            return ok
        except pa.ArrowInvalid:
            pass
    if name in ("date", "date_time", "time"):
        # regex prefilter via RE2, calendar-verify only the matches
        pre = {
            "date": r"^\d{4}-[01]\d-[0-3]\d$",
            "date_time": fmt.DATE_TIME_RE.pattern,
            "time": r"^[0-2]\d:[0-5]\d:[0-6]\d(?:\.\d+)?(?:[Zz]|[-+](?:[01]\d|2[0-3]):(?:[0-5]\d|60))$",
        }[name]
        ok = _ok_with_nulls(pc.match_substring_regex(arr, pre), arr)
        for i in np.nonzero(ok & ~_np_bool(pc.is_null(arr)))[0]:
            ok[i] = checker(arr[int(i)].as_py())
        return ok
    # generic Python fallback over unique values (email, uri, regex, ...)
    uniq = pc.unique(arr.drop_null())
    verdicts = {u.as_py(): checker(u.as_py()) for u in uniq}
    out = np.ones(n, dtype=bool)
    for i, v in enumerate(arr.to_pylist()):
        if v is not None:
            out[i] = verdicts[v]
    return out


# ----------------------------------------------------------------------
# list-column check builders
# ----------------------------------------------------------------------


def _list_offsets(arr) -> tuple:
    """(values, offsets) for a (Large)ListArray, zero-copy.

    Fixed-size lists carry no offsets buffer: a null-free one casts to a
    variable-size list; with null rows the cast would KEEP list_size-long
    segments of null values under each null row (pyarrow 16 behavior), so
    the offsets/values are rebuilt with null rows as truly EMPTY segments
    — the invariant every caller assumes (builder-produced variable-size
    lists give null rows empty segments).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        w = arr.type.list_size
        if arr.null_count:
            valid = _np_bool(pc.is_valid(arr))
            lens = np.where(valid, w, 0).astype(np.int64)
            offsets = np.concatenate([[0], np.cumsum(lens)])
            rows = np.flatnonzero(valid)
            idx = ((arr.offset + rows)[:, None] * w
                   + np.arange(w, dtype=np.int64)).ravel()
            values = arr.values.take(pa.array(idx, type=pa.int64()))
            return values, offsets
        arr = arr.cast(pa.list_(arr.type.value_type))
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return arr.values, offsets


def _segment_reduce(elem_ok: np.ndarray, offsets: np.ndarray, op, empty_value: bool) -> np.ndarray:
    """Per-row reduce over element masks via ``ufunc.reduceat`` (short-circuits
    per segment — orders of magnitude faster than cumsum on this hardware).

    ``reduceat`` quirks handled: duplicate indices (mid-stream empty rows)
    yield ``a[i]`` and are overwritten with ``empty_value``; TRAILING empty
    rows (start index == len) are excluded from the reduceat call entirely —
    clipping them into range would silently shorten the last real segment.
    """
    nrows = len(offsets) - 1
    n = len(elem_ok)
    if nrows == 0:
        return np.ones(0, dtype=bool)
    res = np.full(nrows, empty_value, dtype=bool)
    if n == 0:
        return res
    k = int(np.searchsorted(offsets[:-1], n, side="left"))  # rows starting in-range
    if k:
        res[:k] = op.reduceat(elem_ok, offsets[:-1][:k])
    empty = offsets[1:] == offsets[:-1]
    if empty.any():
        res[empty] = empty_value
    return res


def _segment_all(elem_ok: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row AND over element masks; empty rows → True."""
    return _segment_reduce(elem_ok, offsets, np.logical_and, True)


def _segment_any(elem_ok: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row OR over element masks; empty rows → False (contains on an
    empty list fails, validator.ex:651-675)."""
    return _segment_reduce(elem_ok, offsets, np.logical_or, False)


def inrow_duplicate_rows(vals: np.ndarray, offsets: np.ndarray,
                         elem_null: Optional[np.ndarray] = None) -> np.ndarray:
    """Row indices whose list contains duplicate elements.

    Fast path: pack (row_id, value) into ONE int64 composite key and use a
    single-key ``np.sort`` — ~7× faster than ``np.lexsort`` on this
    hardware.  Falls back to lexsort when the value range is too wide to
    pack.  ``elem_null`` marks null elements (equal to each other)."""
    nrows = len(offsets) - 1
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    row_ids = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offsets))
    use_null = elem_null is not None and elem_null.any()
    iv = vals.astype(np.int64, copy=False) if np.issubdtype(vals.dtype, np.integer) else None
    if iv is not None and not use_null:
        vmin = int(iv.min())
        span = int(iv.max()) - vmin + 1
        if span > 0 and nrows * span < (1 << 62):
            comp = row_ids * np.int64(span) + (iv - vmin)
            comp.sort()
            dup_keys = comp[1:][comp[1:] == comp[:-1]]
            return np.unique(dup_keys // np.int64(span))
    # general path (floats, nulls, wide ranges)
    if use_null:
        clean = np.where(elem_null, 0, vals)
        order = np.lexsort((elem_null, clean, row_ids))
        sv, sr, sn = clean[order], row_ids[order], elem_null[order]
        dup = (sr[1:] == sr[:-1]) & (sv[1:] == sv[:-1]) & (sn[1:] == sn[:-1])
    else:
        order = np.lexsort((vals, row_ids))
        sv, sr = vals[order], row_ids[order]
        dup = (sr[1:] == sr[:-1]) & (sv[1:] == sv[:-1])
    return np.unique(sr[1:][dup])


def _positional_slot_evaluator(s: SchemaNode, value_type, path, compiled):
    """mask_fn(subset_values) -> (ok, kw_of_elem) for one positional slot.

    ``kw_of_elem`` attributes each failing element to a keyword the way the
    single-``items`` arm does (first fail wins, the reference's chain order;
    a null element under a required type is a ``type`` violation,
    validator.ex:242) — ``None`` entries are passing elements."""
    if s.bool_schema is not None:
        const = bool(s.bool_schema)

        def bool_fn(sub, const=const):
            ok = np.full(len(sub), const, dtype=bool)
            kw = np.full(len(sub), None, dtype=object)
            if not const:
                kw[:] = "items"
            return ok, kw
        return bool_fn
    sub_checks = _build_scalar_checks(s, value_type, path, compiled, elem_mode=True)
    requires_type = bool(s.types and not ({"any", "nil"} & set(s.types)))

    def fn(sub, sub_checks=sub_checks, requires_type=requires_type):
        n = len(sub)
        ok = np.ones(n, dtype=bool)
        kw = np.full(n, None, dtype=object)
        for c in sub_checks:
            r = c.fn(sub, None)
            m = r if isinstance(r, np.ndarray) else np.asarray(r)
            newly = ok & ~m
            if newly.any():
                kw[newly] = c.keyword
            ok &= m
        if requires_type and sub.null_count:
            isnull = ~_np_bool(pc.is_valid(sub))
            if isnull.any():
                kw[isnull] = "type"
                ok &= ~isnull
        return ok, kw

    return fn


def _build_positional_items_check(node: SchemaNode, col_type, path: str,
                                  compiled) -> "_Check":
    """Vectorized positional ``items`` + ``additional_items``
    (validator.ex:723-777): per position i, slice the elements at
    ``offsets[row]+i`` for rows longer than i and run slot i's checks."""
    value_type = col_type.value_type
    slots = [_positional_slot_evaluator(_deref(s, compiled), value_type,
                                        f"{path}", compiled)
             for s in node.items]
    additional = node.additional_items
    if isinstance(additional, SchemaNode):
        additional = _deref(additional, compiled)
        add_eval = _positional_slot_evaluator(additional, value_type, path, compiled)
    else:
        add_eval = None
    k = len(slots)

    def fn(col, tbl):
        values, offsets = _list_offsets(col)
        nrows = len(offsets) - 1
        lengths = np.diff(offsets)
        row_ok = np.ones(nrows, dtype=bool)
        viols: list = []

        def fail_grouped(rows, local, kw_of_bad, message):
            # one violation group per failing leaf keyword (same flattening
            # as the single-items arm)
            for keyword in np.unique(kw_of_bad.astype(str)):
                sel = kw_of_bad == keyword
                paths = np.array([f"{path}/{p}" for p in np.atleast_1d(local)[sel]]
                                 if not np.isscalar(local) else
                                 [f"{path}/{local}"] * int(sel.sum()), dtype=object)
                viols.append(CheckViolations(rows[sel].astype(np.int64),
                                             str(keyword), paths, message))

        for i, slot_fn in enumerate(slots):
            rows_i = np.nonzero(lengths > i)[0]
            if len(rows_i) == 0:
                continue
            idx = offsets[:-1][rows_i] + i
            sub = values.take(pa.array(idx, type=pa.int64()))
            ok, kw = slot_fn(sub)
            bad = ~ok
            if bad.any():
                row_ok[rows_i[bad]] = False
                fail_grouped(rows_i[bad], i, kw[bad],
                             f"positional item {i} fails")
        if additional is False:
            over = np.nonzero(lengths > k)[0]
            if len(over):
                row_ok[over] = False
                paths = np.array([f"{path}/{k}"] * len(over), dtype=object)
                viols.append(CheckViolations(over.astype(np.int64),
                                             "additional_items", paths,
                                             "no additional items allowed"))
        elif add_eval is not None:
            # tail elements: positions >= k
            tail_rows = np.nonzero(lengths > k)[0]
            if len(tail_rows):
                starts = offsets[:-1]
                idx_list = [np.arange(starts[r] + k, offsets[1:][r]) for r in tail_rows]
                idx = np.concatenate(idx_list)
                rep = np.concatenate([np.full(len(a), r, dtype=np.int64)
                                      for a, r in zip(idx_list, tail_rows)])
                sub = values.take(pa.array(idx, type=pa.int64()))
                ok, kw = add_eval(sub)
                bad = ~ok
                if bad.any():
                    row_ok[rep[bad]] = False
                    local = idx[bad] - starts[rep[bad]]
                    fail_grouped(rep[bad], local, kw[bad],
                                 "additional item fails schema")
        null_rows = _np_bool(pc.is_null(col))
        row_ok |= null_rows
        if null_rows.any() and viols:
            viols = [CheckViolations(cv.row_idx[~null_rows[cv.row_idx]], cv.keyword,
                                     cv.paths[~null_rows[cv.row_idx]]
                                     if isinstance(cv.paths, np.ndarray) else cv.paths,
                                     cv.message)
                     for cv in viols]
            viols = [cv for cv in viols if len(cv.row_idx)]
        return row_ok, viols

    return _Check("items", fn, "positional item fails", path)


def _build_list_checks(node: SchemaNode, col_type: pa.DataType, path: str,
                       compiled: CompiledSchema) -> list:
    checks: list = []

    if node.min_items is not None:
        n = node.min_items
        checks.append(_Check(
            "min_items",
            lambda col, tbl, n=n: _ok_with_nulls(pc.greater_equal(pc.list_value_length(col), n), col),
            f"expected >= {n} items", path))
    if node.max_items is not None:
        n = node.max_items
        checks.append(_Check(
            "max_items",
            lambda col, tbl, n=n: _ok_with_nulls(pc.less_equal(pc.list_value_length(col), n), col),
            f"expected <= {n} items", path))

    if node.unique_items:
        def unique_fn(col, tbl):
            values, offsets = _list_offsets(col)
            nrows = len(offsets) - 1
            if len(values) == 0:
                return np.ones(nrows, dtype=bool)
            vt = values.type
            if values.null_count == 0 and (
                pa.types.is_integer(vt) or pa.types.is_floating(vt)
            ):
                vals = values.to_numpy(zero_copy_only=False)
            else:
                # Strings / bools / nullable elements: dictionary-encode to
                # int codes (equal values share a code).  Null elements get
                # code -1 — equal to each other ([nil, nil] is a duplicate
                # in the reference); no real value encodes to -1.
                enc = pc.dictionary_encode(values)
                vals = (
                    enc.indices.fill_null(pa.scalar(-1, enc.indices.type))
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
            dup_rows = inrow_duplicate_rows(vals, offsets, None)
            ok = np.ones(nrows, dtype=bool)
            ok[dup_rows] = False
            null_rows = _np_bool(pc.is_null(col))
            ok |= null_rows
            return ok
        checks.append(_Check("unique_items", unique_fn, "duplicate items in list", path))

    if isinstance(node.items, list):
        checks.append(_build_positional_items_check(node, col_type, path, compiled))

    elem_node = node.items if isinstance(node.items, SchemaNode) else None
    if elem_node is not None:
        elem_node = _deref(elem_node, compiled)
        value_type = col_type.value_type
        elem_checks = _build_scalar_checks(elem_node, value_type, path, compiled,
                                           elem_mode=True)
        if elem_node.bool_schema is False:
            checks.append(_Check(
                "items",
                lambda col, tbl: _ok_with_nulls(pc.equal(pc.list_value_length(col), 0), col),
                "items: false accepts only the empty list", path))
        elif elem_checks or (
            elem_node.types and not ({"any", "nil"} & set(elem_node.types))
        ):
            elem_requires_type = bool(
                elem_node.types
                and not ({"any", "nil"} & set(elem_node.types))
            )

            def items_fn(col, tbl, elem_checks=elem_checks, path=path,
                         elem_requires_type=elem_requires_type):
                values, offsets = _list_offsets(col)
                n_vals = len(values)
                elem_ok = None
                np_vals = None
                if values.null_count == 0 and all(c.np_fn is not None for c in elem_checks) \
                        and (pa.types.is_integer(values.type)
                             or pa.types.is_floating(values.type)):
                    # zero-copy numpy over the raw values buffer (only
                    # primitive numeric buffers are zero-copyable —
                    # string/bool raised ArrowInvalid, code-review r2)
                    np_vals = values.to_numpy(zero_copy_only=True)
                for chk in elem_checks:
                    m = chk.np_fn(np_vals) if np_vals is not None else chk.fn(values, None)
                    if elem_ok is None:
                        elem_ok = m if isinstance(m, np.ndarray) else np.asarray(m)
                    else:
                        np.logical_and(elem_ok, m, out=elem_ok)
                if elem_ok is None:
                    elem_ok = np.ones(n_vals, dtype=bool)
                elem_is_null = None
                if values.null_count and elem_requires_type:
                    # a NULL element is not of the required type
                    # (is_integer(nil) is false, validator.ex:242)
                    elem_is_null = ~_np_bool(pc.is_valid(values))
                    elem_ok &= ~elem_is_null
                row_ok = _segment_all(elem_ok, offsets)
                null_rows = _np_bool(pc.is_null(col))
                row_ok |= null_rows
                bad = np.nonzero(~elem_ok)[0]
                if len(bad) == 0:
                    return row_ok, None
                # keyword attribution only for the (rare) failing elements:
                # re-run each check on the bad subset (first fail wins, the
                # reference's chain order); -1 marks null-element type fails
                kw_of_bad = np.zeros(len(bad), dtype=np.int32)
                if elem_is_null is not None:
                    kw_of_bad[elem_is_null[bad]] = -1
                if np_vals is not None:
                    bad_vals = np_vals[bad]
                    unattributed = np.ones(len(bad), dtype=bool)
                    for ci, chk in enumerate(elem_checks):
                        mb = chk.np_fn(bad_vals)
                        newly = unattributed & ~mb
                        kw_of_bad[newly] = ci
                        unattributed &= mb
                else:
                    sub = values.take(pa.array(bad, type=pa.int64()))
                    unattributed = np.ones(len(bad), dtype=bool)
                    for ci, chk in enumerate(elem_checks):
                        mb = chk.fn(sub, None)
                        newly = unattributed & ~mb
                        kw_of_bad[newly] = ci
                        unattributed &= mb
                rows = np.searchsorted(offsets, bad, side="right") - 1
                if col.null_count:
                    # elements under a NULL list cell are not real data; the
                    # row already passes (property-absent semantics)
                    keep = ~null_rows[rows]
                    bad, rows, kw_of_bad = bad[keep], rows[keep], kw_of_bad[keep]
                    if len(bad) == 0:
                        return row_ok, None
                local = bad - offsets[rows]
                paths = np.array([f"{path}/{i}" for i in local], dtype=object)
                # one violation group per failing leaf keyword, so rows carry
                # the leaf keyword at the element path (Xema's nested
                # items→index→keyword reason tree flattened, SURVEY §2.1)
                groups = []
                bad_kw = kw_of_bad
                for ci in np.unique(bad_kw):
                    sel = bad_kw == ci
                    if ci == -1:  # null element failing the required type
                        groups.append(CheckViolations(
                            rows[sel], "type", paths[sel],
                            "null element fails required type"))
                    else:
                        groups.append(CheckViolations(
                            rows[sel], elem_checks[ci].keyword, paths[sel],
                            elem_checks[ci].message))
                return row_ok, groups
            checks.append(_Check("items", items_fn, "invalid list element", path))

    if node.contains is not None:
        contains_node = _deref(node.contains, compiled)
        value_type = col_type.value_type
        if contains_node.bool_schema is False:
            # contains: false — no element can ever match (and the empty
            # list fails contains anyway, validator.ex:651-675)
            checks.append(_Check(
                "contains",
                lambda col, tbl: _np_bool(pc.is_null(col)),
                "no item matches contains schema", path))
        else:
            c_checks = [] if contains_node.bool_schema is True else \
                _build_scalar_checks(contains_node, value_type, path, compiled,
                                     elem_mode=True)
            c_requires_type = bool(
                contains_node.bool_schema is None
                and contains_node.types
                and not ({"any", "nil"} & set(contains_node.types))
            )
            def contains_fn(col, tbl, c_checks=c_checks,
                            c_requires_type=c_requires_type):
                values, offsets = _list_offsets(col)
                elem_ok = np.ones(len(values), dtype=bool)
                for chk in c_checks:
                    elem_ok &= chk.fn(values, None)
                if c_requires_type and values.null_count:
                    # a NULL element cannot satisfy a typed contains schema
                    elem_ok &= _np_bool(pc.is_valid(values))
                row_ok = _segment_any(elem_ok, offsets)
                row_ok |= _np_bool(pc.is_null(col))
                return row_ok
            checks.append(_Check("contains", contains_fn,
                                 "no item matches contains schema", path))

    return checks


def _build_struct_check(node: SchemaNode, col_type, path: str,
                        compiled) -> "_Check":
    """Recursive plan for a STRUCT-typed column: the struct's fields are a
    sub-table, validated with a nested :class:`TablePlan` (map semantics —
    properties/required/additional/pattern-properties/dependencies — all
    apply to the field namespace).  Parent-null rows pass (property
    absent); violation paths are prefixed with the column path."""
    sub_compiled = CompiledSchema(root=node, refs=compiled.refs if compiled else {})
    sub_schema = pa.schema(list(col_type))
    sub_plan = compile_table_plan(sub_compiled, sub_schema)

    def fn(col, tbl):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fields = col.flatten()  # parent nulls propagate into fields
        sub_tbl = pa.table({f.name: arr for f, arr in zip(col_type, fields)})
        sub_valid, sub_viols = evaluate_batch(sub_plan, sub_tbl, fail=_SUBPLAN_FAIL[-1])
        parent_null = _np_bool(pc.is_null(col))
        row_ok = sub_valid | parent_null
        out = []
        for cv in sub_viols:
            keep = ~parent_null[cv.row_idx]
            if not keep.any():
                continue
            paths = cv.paths[keep] if isinstance(cv.paths, np.ndarray) \
                else f"{path}{cv.paths}"
            if isinstance(paths, np.ndarray):
                paths = np.array([f"{path}{p}" for p in paths], dtype=object)
            out.append(CheckViolations(cv.row_idx[keep], cv.keyword, paths,
                                       cv.message))
        return row_ok, out

    return _Check("properties", fn, "struct field fails", path)


def _is_list_of_struct_plan(node: SchemaNode, field_type, compiled) -> bool:
    """list<struct> column whose ``items`` is a map-like schema and whose
    other keywords are the vectorizable list bounds."""
    if not (pa.types.is_list(field_type) or pa.types.is_large_list(field_type)):
        return False
    if not pa.types.is_struct(field_type.value_type):
        return False
    if node.types and not set(node.types) <= {"list", "any"}:
        return False
    if set(node.keywords_present()) - {"min_items", "max_items", "items"}:
        return False
    if not isinstance(node.items, SchemaNode):
        return False
    return _is_map_like(_deref(node.items, compiled))


def _build_list_of_struct_checks(node: SchemaNode, col_type, path: str,
                                 compiled) -> list:
    """Vectorized list<struct> column: the flattened element structs form a
    sub-table validated by a nested :class:`TablePlan`; per-element masks
    reduce to row masks via ``segment_all``, and element violations map
    back to ``/col/<elem_idx>/<field>`` paths."""
    checks: list = []
    if node.min_items is not None:
        n = node.min_items
        checks.append(_Check(
            "min_items",
            lambda col, tbl, n=n: _ok_with_nulls(
                pc.greater_equal(pc.list_value_length(col), n), col),
            f"expected >= {n} items", path))
    if node.max_items is not None:
        n = node.max_items
        checks.append(_Check(
            "max_items",
            lambda col, tbl, n=n: _ok_with_nulls(
                pc.less_equal(pc.list_value_length(col), n), col),
            f"expected <= {n} items", path))

    elem_node = _deref(node.items, compiled)
    sub_compiled = CompiledSchema(root=elem_node,
                                  refs=compiled.refs if compiled else {})
    value_type = col_type.value_type
    elem_requires_type = bool(
        elem_node.types and not ({"any", "nil"} & set(elem_node.types)))
    holder: dict = {}  # sub-plan compiled once per (stable) element schema

    def fn(col, tbl):
        values, offsets = _list_offsets(col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        sub_tbl = pa.table({f.name: arr for f, arr
                            in zip(value_type, values.flatten())})
        plan = holder.get("plan")
        if plan is None:
            plan = compile_table_plan(sub_compiled, sub_tbl.schema)
            holder["plan"] = plan
        elem_ok, sub_viols = evaluate_batch(plan, sub_tbl, fail=_SUBPLAN_FAIL[-1])
        elem_null = None
        if values.null_count:
            elem_null = ~_np_bool(pc.is_valid(values))
            if elem_requires_type:
                elem_ok &= ~elem_null  # null element fails a :map items type
            else:
                elem_ok |= elem_null
        row_ok = _segment_all(elem_ok, offsets)
        row_ok |= _np_bool(pc.is_null(col))
        out = []
        for cv in sub_viols:
            rows = (np.searchsorted(offsets, cv.row_idx, side="right") - 1).astype(np.int64)
            within = cv.row_idx - offsets[rows]
            keep = np.ones(len(rows), dtype=bool)
            if elem_null is not None:
                keep &= ~elem_null[cv.row_idx]
            if not keep.any():
                continue
            if isinstance(cv.paths, np.ndarray):
                paths = np.array([f"{path}/{w}{p}" for w, p
                                  in zip(within, cv.paths)], dtype=object)[keep]
            else:
                paths = np.array([f"{path}/{w}{cv.paths}" for w in within],
                                 dtype=object)[keep]
            out.append(CheckViolations(rows[keep], cv.keyword, paths, cv.message))
        return row_ok, out

    checks.append(_Check("items", fn, "list element fails struct schema", path))
    return checks


# ----------------------------------------------------------------------
# table plan compilation
# ----------------------------------------------------------------------


def compile_table_plan(
    compiled: CompiledSchema,
    table_schema: pa.Schema,
    table_checks: Optional[list] = None,
) -> TablePlan:
    """Compile the root map-schema into vectorized per-column plans.

    Plan-time work (once): column-name keyword handling — ``required``
    presence, ``additional_properties`` on unexpected Parquet columns,
    ``pattern_properties`` by column-name regex, ``property_names`` over
    column names (SURVEY.md §2.1 #19-24) — then per-column check compilation.
    """
    root = _deref(compiled.root, compiled)
    names = set(table_schema.names)

    # a column can be governed by SEVERAL schemas: its declared property
    # AND every matching pattern property (scalar _pattern_props checks
    # declared keys too — the old first-match-wins diverged, code-review r2)
    col_nodes: dict = {}  # name -> [SchemaNode, ...]
    if root.properties:
        for name, sub in root.properties.items():
            # Arrow column names are strings; atom-keyed schema properties
            # match by name (the documented Arrow-layer atom convention)
            if str(name) in names:
                col_nodes.setdefault(str(name), []).append(_deref(sub, compiled))
    if root.pattern_props_re:
        for regex, sub in root.pattern_props_re:
            for name in names:
                if regex.search(name):
                    node = _deref(sub, compiled)
                    lst = col_nodes.setdefault(name, [])
                    if node not in lst:
                        lst.append(node)

    req_names = {str(k) for k in (root.required or ())}
    required = sorted(k for k in req_names if k in names)
    missing_required = sorted(k for k in req_names if k not in names)

    unexpected: list = []
    ap = root.additional_properties
    declared = {str(k) for k in (root.properties or ())}
    if ap is False:
        pattern_res = [r for r, _ in (root.pattern_props_re or [])]
        unexpected = sorted(
            n for n in names
            if n not in declared and not any(r.search(n) for r in pattern_res)
        )
    elif isinstance(ap, SchemaNode):
        pattern_res = [r for r, _ in (root.pattern_props_re or [])]
        for n in sorted(names):
            if n not in declared and not any(r.search(n) for r in pattern_res):
                col_nodes.setdefault(n, []).append(_deref(ap, compiled))

    if root.property_names is not None:
        from xema_ray.functions.scalar import is_valid as _scalar_is_valid
        pn = CompiledSchema(root=_deref(root.property_names, compiled), refs=compiled.refs)
        bad = [n for n in sorted(names) if not _scalar_is_valid(pn, n)]
        unexpected.extend(f"property_names:{n}" for n in bad)

    # --- vectorized root-level checks ---------------------------------
    root_checks: list = []
    if root.dependencies:
        for key, dep in sorted(root.dependencies.items()):
            if not isinstance(dep, list):
                continue  # schema-form → row fallback below
            def dep_fn(tbl: pa.Table, key=key, dep=dep) -> np.ndarray:
                n = tbl.num_rows
                if key not in tbl.column_names:
                    return np.ones(n, dtype=bool)
                present = _np_bool(pc.is_valid(tbl[key]))
                ok = np.ones(n, dtype=bool)
                for d in dep:
                    if d in tbl.column_names:
                        ok &= _np_bool(pc.is_valid(tbl[d]))
                    else:
                        ok[:] = False
                return ok | ~present
            # path = the MAP's own path (scalar/reference parity: the
            # dependencies violation belongs to the map, not the key —
            # caught by the r3 fail-mode property differential)
            root_checks.append(TableCheck(
                keyword="dependencies", fn=dep_fn, path="/",
                message=f"{key!r} requires {dep}"))
    if root.min_properties is not None or root.max_properties is not None:
        lo, hi = root.min_properties, root.max_properties
        def size_fn(tbl: pa.Table, lo=lo, hi=hi) -> np.ndarray:
            count = np.zeros(tbl.num_rows, dtype=np.int64)
            for c in tbl.column_names:
                count += _np_bool(pc.is_valid(tbl[c])).astype(np.int64)
            ok = np.ones(tbl.num_rows, dtype=bool)
            if lo is not None:
                ok &= count >= lo
            if hi is not None:
                ok &= count <= hi
            return ok
        root_checks.append(TableCheck(
            keyword="min_properties" if root.min_properties is not None else "max_properties",
            fn=size_fn, path="/",
            message=f"property count outside [{lo}, {hi}]"))

    # --- schema-form dependencies: vectorized when the dependency schema
    # compiles to a fallback-free sub-plan over the same table (r3, VERDICT
    # item 6) — present(key) ⇒ whole row validates the sub-plan ---------
    schema_deps = {k: d for k, d in (root.dependencies or {}).items()
                   if not isinstance(d, list)}
    residual_deps = {}
    for key, dep in sorted(schema_deps.items()):
        dep_node = _deref(dep, compiled) if isinstance(dep, SchemaNode) else dep
        sub_plan = None
        if isinstance(dep_node, SchemaNode) and dep_node.bool_schema is not None:
            const_ok = bool(dep_node.bool_schema)
        elif isinstance(dep_node, SchemaNode) and _is_map_like(dep_node):
            cand = compile_table_plan(
                CompiledSchema(root=dep_node, refs=compiled.refs), table_schema)
            if cand.root_fallback is None and all(
                    cp.fallback_node is None for cp in cand.column_plans):
                sub_plan, const_ok = cand, None
            else:
                residual_deps[key] = dep
                continue
        else:
            residual_deps[key] = dep
            continue

        def dep_schema_fn(tbl: pa.Table, key=key, sub_plan=sub_plan,
                          const_ok=const_ok) -> np.ndarray:
            n = tbl.num_rows
            if key not in tbl.column_names:
                return np.ones(n, dtype=bool)  # key absent everywhere
            present = _np_bool(pc.is_valid(tbl[key]))
            if sub_plan is None:
                ok = np.full(n, const_ok, dtype=bool)
            else:
                ok, _ = evaluate_batch(sub_plan, tbl, fail="immediately")
            return ok | ~present

        root_checks.append(TableCheck(
            keyword="dependencies", fn=dep_schema_fn, path="/",
            message=f"dependency schema for {key!r} failed"))

    # --- residual root keywords → per-row dict fallback ----------------
    residual_slots = {}
    if root.const is not UNSET:
        residual_slots["const"] = root.const
    for slot in ("enum", "not_", "all_of", "any_of", "one_of", "if_", "then",
                 "else_", "validator"):
        v = getattr(root, slot)
        if v is not None:
            residual_slots[slot] = v
    if residual_deps:
        residual_slots["dependencies"] = residual_deps
    root_fallback = None
    if residual_slots:
        reduced = SchemaNode(**{
            {"const": "const"}.get(k, k): v for k, v in residual_slots.items()
        })
        root_fallback = CompiledSchema(root=reduced, refs=compiled.refs)

    plans: list = []
    for name, nodes in col_nodes.items():
        field_type = table_schema.field(name).type
        for node in nodes:
            cp = ColumnPlan(name=name)
            node = _effective_node(node, field_type)
            if node.is_trivial():
                plans.append(cp)
                continue
            if pa.types.is_struct(field_type) and _is_map_like(node):
                cp.checks = [_build_struct_check(node, field_type, f"/{name}", compiled)]
                cp.collect_kind = True  # map chain collects under :finally
                plans.append(cp)
                continue
            if _is_list_of_struct_plan(node, field_type, compiled):
                cp.checks = _build_list_of_struct_checks(node, field_type,
                                                         f"/{name}", compiled)
                cp.collect_kind = True  # list chain collects under :finally
                plans.append(cp)
                continue
            # struct/map columns keep the scalar fallback for const/enum
            # (general nested ===); LIST columns vectorize it via
            # _list_const_mask (r4)
            is_struct_col = (pa.types.is_struct(field_type)
                             or pa.types.is_map(field_type))
            if _is_vectorizable(node, compiled, col_type=field_type) and not (
                is_struct_col and (node.enum is not None or node.const is not UNSET)
            ):
                is_list_col = (
                    pa.types.is_list(field_type)
                    or pa.types.is_large_list(field_type)
                    or pa.types.is_fixed_size_list(field_type)
                )
                cp.checks = _build_scalar_checks(node, field_type, f"/{name}", compiled)
                if is_list_col:
                    cp.checks.extend(_build_list_checks(node, field_type, f"/{name}", compiled))
                    cp.collect_kind = True  # list chain collects under :finally
            else:
                cp.fallback_node = node
                cp.fallback_compiled = compiled
            plans.append(cp)

    return TablePlan(
        column_plans=plans,
        required=required,
        missing_required=missing_required,
        unexpected_columns=unexpected,
        table_checks=list(table_checks or ()),
        root_checks=root_checks,
        root_fallback=root_fallback,
    )


# ----------------------------------------------------------------------
# batch evaluation
# ----------------------------------------------------------------------


#: scalar map-chain group ranks at the ROOT level (generic keywords run
#: first — scalar._validate order — then the map chain size→keys→required→
#: property_names→dependencies→all_properties, then the custom validator)
_ROOT_RANKS = {
    "enum": 0, "not": 1, "all_of": 2, "any_of": 3, "one_of": 4, "const": 5,
    "if": 6, "min_properties": 7, "max_properties": 7, "keys": 8,
    "required": 9, "property_names": 10, "dependencies": 11,
}
_ROOT_PROPS_RANK = 12   # the all_properties group (every column check)
_ROOT_CUSTOM_RANK = 13  # table-level custom validators

#: per-VALUE keyword-chain group ranks (scalar chain order: type, then the
#: generic group, then the matched type's keyword chain)
_COLUMN_RANKS = {
    "type": -1,
    "enum": 0, "not": 1, "all_of": 2, "any_of": 3, "one_of": 4, "const": 5,
    "if": 6, "ref": 0,
    "minimum": 7, "min_length": 7, "min_items": 7, "properties": 7,
    "maximum": 8, "max_length": 8, "max_items": 8,
    "exclusive_maximum": 9, "pattern": 9, "unique_items": 9,
    "exclusive_minimum": 10, "format": 10, "items": 10,
    "additional_items": 10, "multiple_of": 11, "contains": 11,
}


#: fail mode of the evaluate_batch call currently on the stack — read by
#: nested sub-plan evaluators (struct columns, list<struct> elements) so
#: interior collection follows the caller's mode (reference recursion
#: passes ``opts`` down, validator.ex:489-531); plain module state is safe
#: here because one worker process evaluates one batch at a time
_SUBPLAN_FAIL = ["finally"]


def evaluate_batch(plan: TablePlan, tbl: pa.Table, fail: str = "early"):
    """Evaluate one Arrow batch.  Returns ``(valid_mask, violations)`` where
    ``violations`` is a list of :class:`CheckViolations` (columnar).

    Fail modes affect VIOLATION completeness, never the per-row verdict
    (behaviour.ex:36): every check always runs so ``valid_mask`` is exact,
    then the collected set is trimmed per mode — ``'finally'`` applies the
    reference collect/with-chain shape (:func:`_finally_trim`),
    ``'early'`` keeps per row only the FIRST failing keyword group at
    each level (the reference's ``with``-chain short-circuit,
    behaviour.ex:85-108 / opt_fail_test.exs), ``'immediately'`` keeps one
    violation per row in chain order.  Sub-plans (struct columns,
    list<struct> elements) inherit the caller's mode via
    ``_SUBPLAN_FAIL``, so struct interiors trim exactly too.
    """
    n = tbl.num_rows
    valid = np.ones(n, dtype=bool)
    _SUBPLAN_FAIL.append(fail)
    try:
        return _evaluate_batch_inner(plan, tbl, fail, n, valid)
    finally:
        _SUBPLAN_FAIL.pop()


def _evaluate_batch_inner(plan, tbl, fail, n, valid):
    # (scope, rank, CheckViolations, pretrimmed); scope "" = root; a
    # pretrimmed entry came from the exact scalar path (already collected
    # per the requested mode) and is exempt from per-scope chain trimming
    tagged: list = []

    def add(rows: np.ndarray, keyword: str, paths, message: str,
            scope: str = "", rank: Optional[int] = None, pre: bool = False):
        if len(rows):
            if rank is None:
                table = _ROOT_RANKS if scope == "" else _COLUMN_RANKS
                rank = table.get(keyword, _ROOT_PROPS_RANK if scope == "" else 7)
            tagged.append((scope, rank,
                           CheckViolations(rows, keyword, paths, message), pre))

    for col_name in plan.missing_required:
        valid[:] = False
        add(np.arange(n, dtype=np.int64), "required",
            f"/{col_name}", f"required column {col_name!r} missing from table")

    for col_name in plan.unexpected_columns:
        if col_name.startswith("property_names:"):
            kw = "property_names"
            cname = col_name.split(":", 1)[1]
        else:
            kw = "additional_properties"
            cname = col_name  # may itself contain ':'
        # a null cell means the property is ABSENT in that row — only rows
        # actually carrying the unexpected property are invalid
        if cname in tbl.column_names:
            present = _np_bool(pc.is_valid(tbl[cname]))
        else:
            present = np.ones(n, dtype=bool)
        valid &= ~present
        rank = (_ROOT_RANKS["property_names"] if kw == "property_names"
                else _ROOT_PROPS_RANK)
        add(np.nonzero(present)[0].astype(np.int64), kw, f"/{cname}",
            f"column {cname!r} not allowed by schema", rank=rank)

    for col_name in plan.required:
        nulls = _np_bool(pc.is_null(tbl[col_name]))
        if nulls.any():
            valid &= ~nulls
            add(np.nonzero(nulls)[0].astype(np.int64), "required",
                f"/{col_name}", f"required property {col_name!r} is null")

    scope_kind: dict = {}  # per-chain scope -> finally collects whole group?
    for cp_idx, cp in enumerate(plan.column_plans):
        if cp.name not in tbl.column_names:
            continue
        # one scope per ColumnPlan: a column governed by several schemas
        # (declared property + matching pattern properties) runs several
        # INDEPENDENT keyword chains (all_properties collects each)
        scope = f"{cp.name}\x00{cp_idx}"
        scope_kind[scope] = cp.collect_kind
        col = tbl[cp.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for chk in cp.checks:
            res = chk.fn(col, tbl)
            chk_rank = _COLUMN_RANKS.get(chk.keyword, 7)
            if isinstance(res, tuple):
                ok, elem_viol = res[0], res[1]
                valid &= ok
                if elem_viol is not None:
                    # element violations belong to the CONTAINING group
                    evs = elem_viol if isinstance(elem_viol, list) else [elem_viol]
                    tagged.extend((scope, chk_rank, cv, False) for cv in evs)
            else:
                ok = res
                valid &= ok
                bad = np.nonzero(~ok)[0].astype(np.int64)
                add(bad, chk.keyword, chk.path, chk.message, scope=scope,
                    rank=chk_rank)
        if cp.fallback_node is not None:
            # slow path: per-row scalar validation of this column only
            # (mode-exact collection by construction)
            schema_ctx = cp.fallback_compiled or CompiledSchema(root=cp.fallback_node)
            ctx = CompiledSchema(root=cp.fallback_node, refs=schema_ctx.refs)
            pylist = col.to_pylist()
            for i, v in enumerate(pylist):
                if v is None:
                    continue
                viols = validate_value(ctx, v, fail=fail)
                if viols:
                    valid[i] = False
                    for vv in viols:
                        add(np.array([i], dtype=np.int64), vv.keyword,
                            f"/{cp.name}{vv.path}", vv.message,
                            scope=scope, rank=_COLUMN_RANKS.get(vv.keyword, 7),
                            pre=True)

    for tc in plan.root_checks + plan.table_checks:
        ok = _np_bool(tc.fn(tbl))
        valid &= ok
        rank = _ROOT_RANKS.get(tc.keyword, _ROOT_CUSTOM_RANK)
        add(np.nonzero(~ok)[0].astype(np.int64), tc.keyword, tc.path,
            tc.message, rank=rank)

    if plan.root_fallback is not None:
        # residual map-level keywords (combinators/const/enum/schema-form
        # dependencies): per-row dict validation — the documented slow path
        rows = tbl.to_pylist()
        for i, row in enumerate(rows):
            row = {k: v for k, v in row.items() if v is not None}
            viols = validate_value(plan.root_fallback, row, fail=fail)
            if viols:
                valid[i] = False
                for vv in viols:
                    add(np.array([i], dtype=np.int64), vv.keyword,
                        vv.path or "/", vv.message,
                        rank=_ROOT_RANKS.get(vv.keyword, _ROOT_PROPS_RANK),
                        pre=True)

    if fail == "early":
        out = _early_trim(tagged, n)
    elif fail == "immediately":
        # chain order: root default group before the map group (with-chain,
        # validator.ex:91-97) — sort by root-level rank, then column rank
        ordered = sorted(
            tagged,
            key=lambda t: ((t[1], 0) if t[0] == "" else (_ROOT_PROPS_RANK, t[1])),
        )
        out = _first_violation_per_row([cv for _, _, cv, _ in ordered])
    elif fail == "all":
        # engine extension beyond the reference's three modes: complete
        # collection (every failing keyword, no chain trimming) — what a
        # corpus-QA report wants; the flagship pipeline's default
        out = [cv for _, _, cv, _ in tagged]
    else:
        out = _finally_trim(tagged, n, scope_kind)
    return valid, out


def _keep_filter(out: list, cv: CheckViolations, keep: np.ndarray):
    if keep.all():
        out.append(cv)
    elif keep.any():
        paths = cv.paths[keep] if isinstance(cv.paths, np.ndarray) else cv.paths
        out.append(CheckViolations(cv.row_idx[keep], cv.keyword, paths,
                                   cv.message))


def _early_trim(tagged: list, n: int) -> list:
    """Reference ``fail: :early`` collection: per row keep only the first
    failing group of the root chain; within the properties group, per
    column-chain keep only that chain's first failing group (whole groups
    are collected, unlike ':immediately').  Pretrimmed entries (exact
    scalar path) are exempt from the per-chain filter — the scalar run
    already applied the chain semantics for that value."""
    if not tagged:
        return []
    NO = np.iinfo(np.int32).max
    root_min = np.full(n, NO, dtype=np.int32)
    for scope, rank, cv, _pre in tagged:
        r = rank if scope == "" else _ROOT_PROPS_RANK
        np.minimum.at(root_min, cv.row_idx, r)
    col_min: dict = {}
    for scope, rank, cv, pre in tagged:
        if scope == "" or pre:
            continue
        m = col_min.setdefault(scope, np.full(n, NO, dtype=np.int32))
        np.minimum.at(m, cv.row_idx, rank)
    out: list = []
    for scope, rank, cv, pre in tagged:
        if scope == "":
            keep = root_min[cv.row_idx] == rank
        elif pre:
            keep = root_min[cv.row_idx] == _ROOT_PROPS_RANK
        else:
            keep = (root_min[cv.row_idx] == _ROOT_PROPS_RANK) & \
                   (col_min[scope][cv.row_idx] == rank)
        _keep_filter(out, cv, keep)
    return out


def _finally_trim(tagged: list, n: int, scope_kind: dict) -> list:
    """Reference ``fail: :finally`` collection (validator.ex:91-97,
    99-117, 121-169): per row,

    * a failing root DEFAULT-group keyword (enum/not/combinators/const/if,
      ranks ≤6) aborts the whole chain — only the first such keyword is
      reported, the map group never runs;
    * otherwise every failing MAP-group keyword is collected (``collect``
      branch), including all column chains;
    * within one column chain: list-/map-typed values collect every
      failing keyword group; scalar chains (string/number with-chains)
      report only the first failing keyword — a failing column
      default-group keyword (rank ≤6) likewise suppresses that chain's
      type-group keywords.
    """
    if not tagged:
        return []
    NO = np.iinfo(np.int32).max
    root_min = np.full(n, NO, dtype=np.int32)
    for scope, rank, cv, _pre in tagged:
        r = rank if scope == "" else _ROOT_PROPS_RANK
        np.minimum.at(root_min, cv.row_idx, r)
    col_min: dict = {}
    for scope, rank, cv, pre in tagged:
        if scope == "" or pre:
            continue
        m = col_min.setdefault(scope, np.full(n, NO, dtype=np.int32))
        np.minimum.at(m, cv.row_idx, rank)
    out: list = []
    for scope, rank, cv, pre in tagged:
        if scope == "":
            if rank <= 6:
                keep = root_min[cv.row_idx] == rank
            else:
                keep = root_min[cv.row_idx] >= 7
        elif pre:
            keep = root_min[cv.row_idx] >= 7
        else:
            cm = col_min[scope][cv.row_idx]
            if rank <= 6:
                keep = cm == rank
            elif scope_kind.get(scope, False):
                keep = cm >= 7
            else:
                keep = cm == rank
            keep = keep & (root_min[cv.row_idx] >= 7)
        _keep_filter(out, cv, keep)
    return out


def _first_violation_per_row(violations: list) -> list:
    """Keep one violation per row (the ':immediately' completeness level)."""
    seen: set = set()
    trimmed: list = []
    for cv in violations:
        keep = np.array([r not in seen and not seen.add(r) for r in cv.row_idx.tolist()],
                        dtype=bool) if len(cv.row_idx) else np.zeros(0, dtype=bool)
        if keep.any():
            paths = cv.paths[keep] if isinstance(cv.paths, np.ndarray) else cv.paths
            trimmed.append(CheckViolations(cv.row_idx[keep], cv.keyword, paths, cv.message))
    return trimmed


def violations_to_table(
    violations: list,
    tbl: pa.Table,
    id_col: Optional[str] = None,
    extra_cols: tuple = (),
) -> pa.Table:
    """Assemble violation rows ``(doc_id, path, keyword, message, row_index)``
    from columnar check results — the engine's error-reason output
    (SURVEY.md §2.1 error assembly; validation_error.ex analogue)."""
    all_rows: list = []
    all_paths: list = []
    all_kw: list = []
    all_msg: list = []
    for cv in violations:
        k = len(cv.row_idx)
        all_rows.append(cv.row_idx)
        if isinstance(cv.paths, np.ndarray):
            all_paths.append(cv.paths)
        else:
            all_paths.append(np.full(k, cv.paths, dtype=object))
        all_kw.append(np.full(k, cv.keyword, dtype=object))
        all_msg.append(np.full(k, cv.message, dtype=object))
    if all_rows:
        rows = np.concatenate(all_rows)
        paths = np.concatenate(all_paths)
        kws = np.concatenate(all_kw)
        msgs = np.concatenate(all_msg)
    else:
        rows = np.empty(0, dtype=np.int64)
        paths = np.empty(0, dtype=object)
        kws = np.empty(0, dtype=object)
        msgs = np.empty(0, dtype=object)
    cols = {}
    if id_col is not None and id_col in tbl.column_names:
        cols["doc_id"] = tbl[id_col].take(pa.array(rows, type=pa.int64()))
    cols["path"] = pa.array(paths, type=pa.string())
    cols["keyword"] = pa.array(kws, type=pa.string())
    cols["message"] = pa.array(msgs, type=pa.string())
    cols["row_index"] = pa.array(rows, type=pa.int64())
    for name in extra_cols:
        if name in tbl.column_names:
            cols[name] = tbl[name].take(pa.array(rows, type=pa.int64()))
    return pa.table(cols)
