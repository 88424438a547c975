"""Scalar (per-value) validator — the semantics ground truth.

A complete re-expression of the reference validation semantics
(lib/xema/validator.ex) over Python values.  The distributed engine's
vectorized kernels must agree with this module; it is also the per-row
fallback inside ``map_batches`` for sub-schemas the Arrow kernels can't
express (deeply nested combinators, circular refs, custom validators).

Semantics pinned from the reference:

* type dispatch: union types pick the first matching type
  (validator.ex:73-79, 220-268); ``:integer`` accepts zero-fraction floats
  (validator.ex:242,250); bool is NOT an integer/number.
* equality is *strict* (Elixir ``===``): ``1`` / ``1.0`` / ``true`` are three
  distinct values for ``enum`` membership and ``unique_items`` hashing, with
  the explicit int↔zero-fraction-float cross-checks of validator.ex:346-376.
* ``const`` uses term equality plus numeric ``==`` for numbers
  (validator.ex:274-292).
* ``minimum``/``maximum`` honor draft-4 boolean ``exclusive_*``
  (validator.ex:497-550); numeric ``exclusive_*`` is the draft-6 form.
* ``contains`` fails on an empty list (validator.ex:651-675:
  ``length(errors) < length(list)``).
* ``items: false`` accepts only the empty list (validator.ex:694-696).
* fail modes ``immediately`` / ``early`` (default) / ``finally`` control how
  many violations are collected, not the verdict (behaviour.ex:36,
  opt_fail_test.exs:34-118).
* a node with ``ref`` delegates to the referenced schema and ignores
  siblings (validator.ex:80, draft-7 ``$ref`` behavior).
"""

from __future__ import annotations

import math
import re
import unicodedata
from dataclasses import dataclass
from typing import Any, Optional

from xema_ray.functions.formats import check_format
from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode
from xema_ray.schema.builder import resolve_pointer


@dataclass
class Violation:
    """One constraint failure: the engine's violation-row unit
    ``(path, keyword, message)`` (SURVEY.md §2.1 error assembly)."""

    path: str  # JSON-pointer-ish location, "" = whole value
    keyword: str
    message: str

    def as_row(self) -> dict:
        return {"path": self.path or "/", "keyword": self.keyword, "message": self.message}


class Atom(str):
    """Marker type standing in for Elixir atoms in Python data (the engine's
    Arrow representation is a dictionary-encoded string column).

    Equality is strict as in Elixir: ``:foo == "foo"`` is false, so an
    Atom never equals a plain str — which also makes dict lookups key-kind
    exact (``%{foo: 1}`` has no key ``"foo"``, map_test.exs:51-58).
    Subclass priority means ``"foo" == Atom("foo")`` routes here too.
    """

    __slots__ = ()

    #: the process's "atom table" — every Atom constructed (schema
    #: literals, enum members, test data) registers here, mirroring how
    #: atoms come into existence in the Erlang VM.  ``to_existing_atom``
    #: semantics (cast key/atom conversion) check membership.
    table: set = set()

    def __new__(cls, s: str = "", *, register: bool = True):
        self = str.__new__(cls, s)
        if register:
            cls.table.add(str(s))
        return self

    @classmethod
    def exists(cls, s) -> bool:
        return str(s) in cls.table

    def __eq__(self, other):
        return isinstance(other, Atom) and str.__eq__(self, other)

    def __ne__(self, other):
        eq = self.__eq__(other)
        return not eq

    __hash__ = str.__hash__

    def __repr__(self):  # Elixir-style, for readable test diffs
        return f":{str(self)}"


class _Stop(Exception):
    """Raised to unwind on the first violation in fail='immediately'."""


@dataclass
class _Ctx:
    compiled: Optional[CompiledSchema]
    fail: str = "early"  # immediately | early | finally


# --- value classification (validator.ex:226-268) -----------------------

_TYPE_ORDER = (  # @types order, validator.ex:26-39
    "atom", "struct", "boolean", "float", "integer", "keyword",
    "list", "map", "nil", "number", "string", "tuple",
)


def _is_keyword_list(v: Any) -> bool:
    # Keyword.keyword?/1: 2-tuples with ATOM keys ([{"3", 3}] is a plain
    # list of tuples, not a keyword list — cast/list_test.exs:170-188)
    return isinstance(v, list) and all(
        isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], Atom)
        for e in v
    ) and len(v) > 0


def _is_struct(v: Any) -> bool:
    return isinstance(v, dict) and "__struct__" in v


def type_check(type_name: str, v: Any) -> bool:
    if type_name == "any":
        return True
    if type_name == "atom":
        # Elixir atoms are distinct from binaries; Python strings must NOT
        # classify as atoms or the string keyword chain would be skipped.
        return isinstance(v, (Atom, bool)) or v is None
    if type_name == "boolean":
        return isinstance(v, bool)
    if type_name == "string":
        # atoms are not binaries (:foo fails a :string schema)
        return isinstance(v, str) and not isinstance(v, Atom)
    if type_name == "tuple":
        return isinstance(v, tuple)
    if type_name == "keyword":
        return _is_keyword_list(v) or (isinstance(v, list) and not v)
    if type_name == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if type_name == "integer":
        return (isinstance(v, int) and not isinstance(v, bool)) or _like_integer(v)
    if type_name == "float":
        return isinstance(v, float)
    if type_name == "map":
        return isinstance(v, dict)
    if type_name == "list":
        return isinstance(v, list)
    if type_name == "struct":
        return _is_struct(v)
    if type_name == "nil":
        return v is None
    return False


def _like_integer(v: Any) -> bool:
    return isinstance(v, float) and math.isfinite(v) and v == int(v)


def _value_type(v: Any) -> str:
    if isinstance(v, list) and not v:
        return "list"  # get_type([]) special case (validator.ex:216)
    for t in _TYPE_ORDER:
        name = t if t != "nil" else "nil"
        if type_check(name, v):
            return name
    return "any"


# --- strict (===) equality helpers -------------------------------------

def strict_eq(a: Any, b: Any) -> bool:
    """Elixir ``===``: bool ≠ int, int ≠ float, recursive for containers."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return type(a) is type(b) and a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(strict_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(strict_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        # dict KEYS compare strictly too: Python conflates 1 == 1.0 == True
        # but Elixir maps keyed by 1 / 1.0 / true are distinct values
        if len(a) != len(b):
            return False
        bk = {distinct_key(k): k for k in b}
        for k, v in a.items():
            dk = distinct_key(k)
            if dk not in bk or not strict_eq(v, b[bk[dk]]):
                return False
        return True
    if type(a) is not type(b):
        return False
    return a == b


def distinct_key(v: Any):
    """Hashable strict-identity key (unique_items, validator.ex:618-648)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, list):
        return ("l", tuple(distinct_key(e) for e in v))
    if isinstance(v, tuple):
        return ("t", tuple(distinct_key(e) for e in v))
    if isinstance(v, dict):
        return ("m", frozenset((distinct_key(k), distinct_key(x))
                               for k, x in v.items()))
    return (type(v).__name__, v)


def grapheme_length(s: str) -> int:
    """Approximate grapheme count (``String.length``, validator.ex:568):
    combining marks don't count; good for the Latin + combining-accent cases
    the reference suite exercises."""
    return sum(1 for ch in s if not unicodedata.category(ch).startswith("M")) or (
        0 if s == "" else min(1, len(s))
    )


def _fmt(v: Any, limit: int = 80) -> str:
    r = repr(v)
    return r if len(r) <= limit else r[: limit - 3] + "..."


# --- the validator -----------------------------------------------------

def validate_value(
    schema, value: Any, fail: str = "early", _path: str = ""
) -> list:
    """Validate one value; return a list of :class:`Violation` ([] = valid)."""
    if fail == "all":
        # engine extension (complete collection): the scalar path's chain
        # structure makes "collect everything" = :finally for the keyword
        # sets it evaluates; vector-layer "all" differs only in scalar
        # multi-keyword chains, which the kernel path handles natively
        fail = "finally"
    if fail not in ("immediately", "early", "finally"):
        # reference raises ArgumentError for unknown fail options
        # (opt_fail_test.exs:8-11)
        raise ValueError(
            f"fail must be one of 'immediately', 'early', 'finally'; got {fail!r}"
        )
    if isinstance(schema, CompiledSchema):
        compiled, node = schema, schema.root
    else:
        compiled, node = None, schema
    ctx = _Ctx(compiled=compiled, fail=fail)
    try:
        return _do_validate(node, value, ctx, _path)
    except _Stop as stop:
        return stop.args[0]


def is_valid(schema, value: Any) -> bool:
    return not validate_value(schema, value, fail="immediately")


def _emit(ctx: _Ctx, violations: list) -> list:
    if violations and ctx.fail == "immediately":
        raise _Stop(violations[:1])
    return violations


def _do_validate(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.bool_schema is True:
        return []
    if node.bool_schema is False:
        return _emit(ctx, [Violation(path, "type", "schema rejects all values")])
    if node.ref is not None:
        return _ref(node, value, ctx, path)

    types = node.types
    if types is None or types == ("any",):
        vtype = _value_type(value)
        errs = _by_default(node, value, ctx, path)
        if errs:
            return errs
        errs = _by_type(vtype, node, value, ctx, path)
        if errs:
            return errs
        return _custom(node, value, ctx, path)

    if len(types) == 1:
        t = types[0]
        if not type_check(t, value):
            return _emit(ctx, [Violation(path, "type", f"expected {t}, got {_fmt(value)}")])
        matched = t
    else:
        matched = next((t for t in types if type_check(t, value)), None)
        if matched is None:
            return _emit(
                ctx, [Violation(path, "type", f"expected one of {list(types)}, got {_fmt(value)}")]
            )
    errs = _by_default(node, value, ctx, path)
    if errs:
        return errs
    errs = _by_type(matched, node, value, ctx, path)
    if errs:
        return errs
    return _custom(node, value, ctx, path)


def _ref(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if ctx.compiled is None:
        raise ValueError(f"ref {node.ref!r} needs a CompiledSchema context")
    target = resolve_pointer(ctx.compiled, node.ref)
    return _do_validate(target, value, ctx, path)


# --- keyword groups ----------------------------------------------------

def _by_default(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    """enum, not, all_of, any_of, one_of, const, if/then/else
    (validator.ex:99-108)."""
    for fn in (_enum, _not, _all_of, _any_of, _one_of, _const, _if_then_else):
        errs = fn(node, value, ctx, path)
        if errs:
            return errs
    return []


def _by_type(vtype: str, node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if vtype == "string":
        return _chain(ctx, [
            lambda: _min_length(node, value, path),
            lambda: _max_length(node, value, path),
            lambda: _pattern(node, value, path),
            lambda: _format(node, value, path),
        ])
    if vtype in ("list", "tuple"):
        seq = list(value) if isinstance(value, tuple) else value
        checks = [
            lambda: _min_items(node, value, path),
            lambda: _max_items(node, value, path),
            lambda: _unique(node, seq, path),
            lambda: _items(node, seq, ctx, path),
            lambda: _contains(node, seq, ctx, path),
        ]
        if ctx.fail == "finally":
            return _collect(ctx, checks)
        return _chain(ctx, checks)
    if vtype == "struct":
        errs = _module(node, value, path)
        if errs:
            return _emit(ctx, errs)
        return _by_type("map", node, value, ctx, path)
    if vtype == "map":
        checks = [
            lambda: _size(node, value, path),
            lambda: _keys(node, value, path),
            lambda: _required(node, value, path),
            lambda: _property_names(node, value, ctx, path),
            lambda: _dependencies(node, value, ctx, path),
            lambda: _all_properties(node, value, ctx, path),
        ]
        if ctx.fail == "finally":
            return _collect(ctx, checks)
        return _chain(ctx, checks)
    if vtype == "keyword":
        as_map = dict(value)
        checks = [
            lambda: _dependencies(node, as_map, ctx, path, orig=value),
            lambda: _size(node, value, path),
            lambda: _required(node, as_map, path),
            lambda: _property_names(node, as_map, ctx, path),
            lambda: _all_properties(node, as_map, ctx, path),
        ]
        if ctx.fail == "finally":
            return _collect(ctx, checks)
        return _chain(ctx, checks)
    if vtype in ("integer", "float", "number"):
        return _chain(ctx, [
            lambda: _minimum(node, value, path),
            lambda: _maximum(node, value, path),
            lambda: _exclusive_maximum(node, value, path),
            lambda: _exclusive_minimum(node, value, path),
            lambda: _multiple_of(node, value, path),
        ])
    return []  # boolean / nil / atom / any: no extra keywords


def _chain(ctx: _Ctx, checks: list) -> list:
    for check in checks:
        errs = check()
        if errs:
            return _emit(ctx, errs)
    return []


def _collect(ctx: _Ctx, checks: list) -> list:
    out: list = []
    for check in checks:
        out.extend(check())
    return _emit(ctx, out)


def _custom(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.validator is None:
        return []
    result = node.validator(value)
    if result is None or result is True:
        return []
    msg = result if isinstance(result, str) else f"custom validator rejected {_fmt(value)}"
    return _emit(ctx, [Violation(path, "validator", msg)])


# --- generic keywords --------------------------------------------------

def _enum(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.enum is None:
        return []
    members = node.enum
    ok = any(strict_eq(m, value) for m in members)
    if not ok and isinstance(value, int) and not isinstance(value, bool):
        ok = any(strict_eq(m, float(value)) for m in members)
    if not ok and isinstance(value, float) and _like_integer(value):
        ok = any(strict_eq(m, int(value)) for m in members)
    if ok:
        return []
    return _emit(ctx, [Violation(path, "enum", f"{_fmt(value)} not in {_fmt(members)}")])


def _const(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.const is UNSET:
        return []
    const = node.const
    if strict_eq(const, value):
        return []
    if (
        isinstance(const, (int, float))
        and not isinstance(const, bool)
        and isinstance(value, (int, float))
        and not isinstance(value, bool)
        and const == value
    ):
        return []
    return _emit(ctx, [Violation(path, "const", f"expected {_fmt(const)}, got {_fmt(value)}")])


def _not(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.not_ is None:
        return []
    if _passes(node.not_, value, ctx):
        return _emit(ctx, [Violation(path, "not", f"value must not match schema: {_fmt(value)}")])
    return []


def _all_of(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.all_of is None:
        return []
    out: list = []
    for sub in node.all_of:
        out.extend(_sub_validate(sub, value, ctx, path))
    if out:
        return _emit(ctx, [Violation(path, "all_of", f"{len(out)} sub-schema failure(s)")] + out)
    return []


def _any_of(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.any_of is None:
        return []
    for sub in node.any_of:
        if _passes(sub, value, ctx):
            return []
    return _emit(ctx, [Violation(path, "any_of", f"no branch matched {_fmt(value)}")])


def _one_of(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.one_of is None:
        return []
    successes = [i for i, sub in enumerate(node.one_of) if _passes(sub, value, ctx)]
    if len(successes) == 1:
        return []
    if not successes:
        return _emit(ctx, [Violation(path, "one_of", f"no branch matched {_fmt(value)}")])
    return _emit(
        ctx, [Violation(path, "one_of", f"more than one branch matched: {successes}")]
    )


def _if_then_else(node: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if node.if_ is None or (node.then is None and node.else_ is None):
        return []
    branch = node.then if _passes(node.if_, value, ctx) else node.else_
    if branch is None:
        return []
    return _emit(ctx, _sub_validate(branch, value, ctx, path))


def _passes(sub: SchemaNode, value: Any, ctx: _Ctx) -> bool:
    """valid? without contributing violations (combinator branches)."""
    inner = _Ctx(compiled=ctx.compiled, fail="immediately")
    try:
        return not _do_validate(sub, value, inner, "")
    except _Stop:
        return False


def _sub_validate(sub: SchemaNode, value: Any, ctx: _Ctx, path: str) -> list:
    if ctx.fail == "immediately":
        return _do_validate(sub, value, ctx, path)  # _Stop propagates
    inner = _Ctx(compiled=ctx.compiled, fail=ctx.fail)
    return _do_validate(sub, value, inner, path)


# --- numeric -----------------------------------------------------------

def _minimum(node: SchemaNode, v, path: str) -> list:
    m = node.minimum
    if m is None:
        return []
    excl = node.exclusive_minimum
    if v > m:
        return []
    if v == m and excl is not True:
        return []
    op = ">" if excl is True else ">="
    return [Violation(path, "minimum", f"expected {op} {m}, got {v}")]


def _maximum(node: SchemaNode, v, path: str) -> list:
    m = node.maximum
    if m is None:
        return []
    excl = node.exclusive_maximum
    if v < m:
        return []
    if v == m and excl is not True:
        return []
    op = "<" if excl is True else "<="
    return [Violation(path, "maximum", f"expected {op} {m}, got {v}")]


def _exclusive_minimum(node: SchemaNode, v, path: str) -> list:
    m = node.exclusive_minimum
    if m is None or isinstance(m, bool):
        return []
    if v > m:
        return []
    return [Violation(path, "exclusive_minimum", f"expected > {m}, got {v}")]


def _exclusive_maximum(node: SchemaNode, v, path: str) -> list:
    m = node.exclusive_maximum
    if m is None or isinstance(m, bool):
        return []
    if v < m:
        return []
    return [Violation(path, "exclusive_maximum", f"expected < {m}, got {v}")]


def _multiple_of(node: SchemaNode, v, path: str) -> list:
    m = node.multiple_of
    if m is None:
        return []
    if isinstance(v, int) and not isinstance(v, bool) and isinstance(m, int):
        ok = v % m == 0
    else:
        x = v / m
        ok = x - math.floor(x) == 0
    if ok:
        return []
    return [Violation(path, "multiple_of", f"{v} is not a multiple of {m}")]


# --- string ------------------------------------------------------------

def _min_length(node: SchemaNode, v: str, path: str) -> list:
    if node.min_length is None:
        return []
    if grapheme_length(v) >= node.min_length:
        return []
    return [Violation(path, "min_length", f"length < {node.min_length}: {_fmt(v)}")]


def _max_length(node: SchemaNode, v: str, path: str) -> list:
    if node.max_length is None:
        return []
    if grapheme_length(v) <= node.max_length:
        return []
    return [Violation(path, "max_length", f"length > {node.max_length}: {_fmt(v)}")]


def _pattern(node: SchemaNode, v: str, path: str) -> list:
    if node.pattern_re is None:
        return []
    if node.pattern_re.search(v):
        return []
    return [Violation(path, "pattern", f"{_fmt(v)} does not match /{node.pattern}/")]


def _format(node: SchemaNode, v: str, path: str) -> list:
    if node.format is None:
        return []
    ok = check_format(node.format, v)
    if ok is None or ok:
        return []
    return [Violation(path, "format", f"{_fmt(v)} is not a valid {node.format}")]


# --- list / tuple ------------------------------------------------------

def _min_items(node: SchemaNode, v, path: str) -> list:
    if node.min_items is None:
        return []
    if len(v) >= node.min_items:
        return []
    return [Violation(path, "min_items", f"expected >= {node.min_items} items, got {len(v)}")]


def _max_items(node: SchemaNode, v, path: str) -> list:
    if node.max_items is None:
        return []
    if len(v) <= node.max_items:
        return []
    return [Violation(path, "max_items", f"expected <= {node.max_items} items, got {len(v)}")]


def _unique(node: SchemaNode, seq: list, path: str) -> list:
    if not node.unique_items:
        return []
    seen = set()
    for e in seq:
        k = distinct_key(e)
        if k in seen:
            return [Violation(path, "unique_items", f"duplicate item {_fmt(e)}")]
        seen.add(k)
    return []


def _items(node: SchemaNode, seq: list, ctx: _Ctx, path: str) -> list:
    if node.items is None:
        return []
    out: list = []
    if isinstance(node.items, list):  # positional (validator.ex:723-777)
        additional = node.additional_items
        schemas = node.items
        for i, item in enumerate(seq):
            ipath = f"{path}/{i}"
            if i < len(schemas):
                errs = _sub_validate(schemas[i], item, ctx, ipath)
            elif additional is False:
                errs = [Violation(ipath, "additional_items", "no additional items allowed")]
            elif additional in (None, True):
                errs = []
            else:
                errs = _sub_validate(additional, item, ctx, ipath)
            if errs:
                out.extend(errs)
                if ctx.fail == "immediately":
                    break
        return _emit(ctx, out)
    # single schema for all items (validator.ex:694-721)
    sub = node.items
    if sub.bool_schema is False:
        if not seq:
            return []
        return _emit(ctx, [Violation(path, "items", "items: false accepts only the empty list")])
    if sub.bool_schema is True:
        return []
    for i, item in enumerate(seq):
        errs = _sub_validate(sub, item, ctx, f"{path}/{i}")
        if errs:
            out.extend(errs)
            if ctx.fail == "immediately":
                break
    return _emit(ctx, out)


def _contains(node: SchemaNode, seq: list, ctx: _Ctx, path: str) -> list:
    if node.contains is None:
        return []
    if any(_passes(node.contains, item, ctx) for item in seq):
        return []
    return _emit(ctx, [Violation(path, "contains", "no item matches the contains schema")])


# --- map / struct ------------------------------------------------------

def _module(node: SchemaNode, v, path: str) -> list:
    if node.module is None:
        return []
    if isinstance(v, dict) and v.get("__struct__") == node.module:
        return []
    return [Violation(path, "module", f"expected struct {node.module}")]


def _size(node: SchemaNode, v, path: str) -> list:
    if node.min_properties is None and node.max_properties is None:
        return []
    n = len(v)
    if node.min_properties is not None and n < node.min_properties:
        return [Violation(path, "min_properties", f"expected >= {node.min_properties} properties, got {n}")]
    if node.max_properties is not None and n > node.max_properties:
        return [Violation(path, "max_properties", f"expected <= {node.max_properties} properties, got {n}")]
    return []


def _keys(node: SchemaNode, v: dict, path: str) -> list:
    """Atoms-vs-strings key restriction (validator.ex:779-794).  The Arrow
    layer has no analogue (column names are strings); over Python data the
    ``Atom`` marker carries the key kind."""
    if node.keys is None:
        return []
    if node.keys == "atoms":
        bad = [k for k in v if not isinstance(k, Atom)]
    elif node.keys == "strings":
        bad = [k for k in v if not isinstance(k, str) or isinstance(k, Atom)]
    else:
        return []
    if not bad:
        return []
    return [Violation(path, "keys", f"expected :{node.keys} keys, got {bad[0]!r}")]


def _required(node: SchemaNode, v: dict, path: str) -> list:
    if node.required is None:
        return []
    missing = sorted(k for k in node.required if k not in v)
    if not missing:
        return []
    return [Violation(f"{path}/{k}", "required", "required property missing") for k in missing]


def _property_names(node: SchemaNode, v: dict, ctx: _Ctx, path: str) -> list:
    if node.property_names is None:
        return []
    out = []
    for key in v:
        if not isinstance(key, str):
            continue
        # atom keys validate as their string form (validator.ex:331-335)
        name = str(key) if isinstance(key, Atom) else key
        if not _passes(node.property_names, name, ctx):
            out.append(Violation(f"{path}/{key}", "property_names", f"invalid property name {key!r}"))
    return _emit(ctx, out)


def _dependencies(node: SchemaNode, v: dict, ctx: _Ctx, path: str,
                  orig=None) -> list:
    """``orig`` is the pre-map-conversion value (a keyword list): the
    schema form validates the ORIGINAL term (validator.ex dependencies),
    so a :keyword-typed dependency schema sees the keyword list."""
    if node.dependencies is None:
        return []
    for key, dep in node.dependencies.items():
        if key not in v:
            continue
        if isinstance(dep, list):
            for d in dep:
                if d not in v:
                    return _emit(ctx, [
                        Violation(path, "dependencies", f"{key!r} requires {d!r}")
                    ])
        else:
            errs = _sub_validate(dep, v if orig is None else orig, ctx, path)
            if errs:
                return _emit(ctx, [
                    Violation(path, "dependencies", f"dependency schema for {key!r} failed")
                ] + errs)
    return []


def _all_properties(node: SchemaNode, v: dict, ctx: _Ctx, path: str) -> list:
    out: list = []
    out.extend(_pattern_props(node, v, ctx, path))
    if out and ctx.fail == "immediately":
        return _emit(ctx, out)
    out.extend(_properties(node, v, ctx, path))
    if out and ctx.fail == "immediately":
        return _emit(ctx, out)
    out.extend(_additionals(node, v, ctx, path))
    return _emit(ctx, out)


def _properties(node: SchemaNode, v: dict, ctx: _Ctx, path: str) -> list:
    if node.properties is None:
        return []
    out: list = []
    for prop, sub in node.properties.items():
        if prop not in v:
            continue  # presence handled by required (validator.ex:846-848)
        errs = _sub_validate(sub, v[prop], ctx, f"{path}/{prop}")
        if errs:
            out.extend(errs)
            if ctx.fail == "immediately":
                break
    return out


def _pattern_props(node: SchemaNode, v: dict, ctx: _Ctx, path: str) -> list:
    if not node.pattern_props_re:
        return []
    out: list = []
    for regex, sub in node.pattern_props_re:
        for key in v:
            if isinstance(key, str) and regex.search(key):
                errs = _sub_validate(sub, v[key], ctx, f"{path}/{key}")
                out.extend(errs)
    return out


def _additionals(node: SchemaNode, v: dict, ctx: _Ctx, path: str) -> list:
    ap = node.additional_properties
    if ap is None or ap is True:
        return []
    declared = set(node.properties or ())
    pattern_res = [r for r, _ in (node.pattern_props_re or [])]
    extras = {
        k: val
        for k, val in v.items()
        if k not in declared
        and not any(r.search(k) for r in pattern_res if isinstance(k, str))
        and k != "__struct__"
    }
    if ap is False or ap == "delete":
        if ap == "delete":
            return []
        return [
            Violation(f"{path}/{k}", "additional_properties", "additional property not allowed")
            for k in extras
        ]
    out: list = []
    for k, val in extras.items():
        out.extend(_sub_validate(ap, val, ctx, f"{path}/{k}"))
    return out
