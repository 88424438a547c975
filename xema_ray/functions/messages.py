"""Reference-exact validation error messages.

Two halves, both ported from the reference's public behavior:

* :func:`validation_reason` — re-validates a value producing the same
  nested *reason* structure the reference validator returns
  (``%{type: :integer, value: 2.3}``, ``%{properties: %{key => reason}}``,
  ``%{any_of: [reasons], value: v}`` …; lib/xema/validator.ex result
  shapes).  Per level the FIRST failing check in chain order wins;
  properties / items / combinator branches collect all failing members.
* :func:`format_error` — the message renderer
  (lib/xema/validation_error.ex:121-411): keyword-specific phrasings,
  ``, at [:path]."`` suffixes, two-space indentation for nested schema
  failures, and Elixir ``inspect``-style value formatting
  (:func:`elixir_inspect`).

``validation_message(schema, value)`` == the reference's
``Exception.message/1`` for the error — pinned by the 201
``Exception.message`` assertions extracted from the hand-written suites
(tests/test_reference_messages.py).
"""

from __future__ import annotations

import math
import re
from typing import Any, Optional

from xema_ray.functions.scalar import (
    Atom,
    _is_keyword_list,
    _value_type,
    grapheme_length,
    strict_eq,
    type_check,
)
from xema_ray.functions.formats import check_format
from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode

_INDENT = "  "

OK = None  # a valid subtree produces no reason


# ----------------------------------------------------------------------
# Elixir inspect/1 for the Python stand-ins
# ----------------------------------------------------------------------

_PLAIN_ATOM = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*[?!]?$")


def elixir_inspect(v: Any) -> str:
    if v is True:
        return "true"
    if v is False:
        return "false"
    if v is None:
        return "nil"
    if isinstance(v, Atom):
        s = str(v)
        if s in ("nil", "true", "false"):  # special atoms inspect bare
            return s
        return f":{s}" if _PLAIN_ATOM.match(s) else f':"{s}"'
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, float):
        if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, tuple):
        return "{" + ", ".join(elixir_inspect(e) for e in v) + "}"
    if isinstance(v, list):
        if _is_keyword_list(v):
            return "[" + ", ".join(
                f"{_kw_key(k)}: {elixir_inspect(x)}" for k, x in v) + "]"
        return "[" + ", ".join(elixir_inspect(e) for e in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: _term_order(kv[0]))
        if all(isinstance(k, Atom) and _PLAIN_ATOM.match(str(k)) for k in v):
            body = ", ".join(f"{str(k)}: {elixir_inspect(x)}" for k, x in items)
        else:
            body = ", ".join(
                f"{elixir_inspect(k)} => {elixir_inspect(x)}" for k, x in items)
        return "%{" + body + "}"
    if isinstance(v, re.Pattern):
        return f"~r/{v.pattern}/"
    return repr(v)


def _kw_key(k) -> str:
    s = str(k)
    return s if _PLAIN_ATOM.match(s) else f'"{s}"'


def _term_order(k):
    """Erlang term order for map-key sorting: number < atom < binary."""
    if isinstance(k, bool):
        return (1, str(k).lower())
    if isinstance(k, (int, float)):
        return (0, k)
    if isinstance(k, Atom):
        return (1, str(k))
    if isinstance(k, tuple):
        return (2, tuple(_term_order(e) for e in k))
    if isinstance(k, str):
        return (4, k)
    return (3, str(k))


def _type_atom(t: str):
    return Atom(t)


# ----------------------------------------------------------------------
# reason-tree builder
# ----------------------------------------------------------------------


def validation_reason(schema, value: Any, fail: str = "early"):
    """Reference-shaped reason for an invalid value, or ``None``.

    Fail modes (behaviour.ex:85-108, opt_fail_test.exs): ``immediately``
    and ``early`` return the FIRST failing keyword group of the chain
    (immediately additionally keeps only one member inside collecting
    groups); ``finally`` runs every group and returns the failing group
    reasons as a list in reverse chain order (a bare map when only one
    group failed).
    """
    if isinstance(schema, CompiledSchema):
        compiled, node = schema, schema.root
    else:
        compiled, node = None, schema
    return _reason(node, value, compiled, fail)


def _deref(node: SchemaNode, compiled):
    seen = set()
    while node.ref is not None and compiled is not None and id(node) not in seen:
        seen.add(id(node))
        from xema_ray.schema.builder import resolve_pointer

        node = resolve_pointer(compiled, node.ref)
    return node


def _reason(node: SchemaNode, value, compiled, fail: str = "early"):
    node = _deref(node, compiled)
    if node.bool_schema is True:
        return OK
    if node.bool_schema is False:
        return {"type": False}

    types = node.types
    if types is None or types == ("any",):
        matched = _value_type(value)
    elif len(types) == 1:
        t = types[0]
        if not type_check(t, value):
            return {"type": _type_atom(t), "value": value}
        matched = t
    else:
        matched = next((t for t in types if type_check(t, value)), None)
        if matched is None:
            return {"type": [_type_atom(t) for t in types], "value": value}

    # keyword-chain GROUPS in scalar order: generic first, then the
    # matched type's chain, then the custom validator.  early/immediately
    # stop at the first failing group; finally runs them all.
    groups: list = []
    for fn in _group_fns(matched, node):
        r = fn(node, value, compiled, fail)
        if r is not None:
            groups.append(r)
            if fail != "finally":
                break
    if not groups:
        return OK
    if fail == "finally":
        return groups[0] if len(groups) == 1 else list(reversed(groups))
    return groups[0]


def _passes(node: SchemaNode, value, compiled) -> bool:
    return _reason(node, value, compiled) is None


def _group_fns(matched: str, node: SchemaNode) -> list:
    fns = [_g_enum, _g_not, _g_all_of, _g_any_of, _g_one_of, _g_const, _g_ite]
    if matched in ("integer", "float", "number"):
        fns += [_g_minimum, _g_maximum, _g_excl_max, _g_excl_min, _g_multiple_of]
    elif matched == "string":
        fns += [_g_min_length, _g_max_length, _g_pattern, _g_format]
    elif matched in ("list", "tuple"):
        fns += [_g_min_items, _g_max_items, _g_unique, _g_items, _g_contains]
    elif matched in ("map", "keyword", "struct"):
        fns += [_g_module, _g_size, _g_keys, _g_required, _g_property_names,
                _g_dependencies, _g_all_properties]
    fns.append(_g_validator)
    return fns


# --- generic groups ----------------------------------------------------


def _num_cross_eq(a, b) -> bool:
    return (isinstance(a, (int, float)) and not isinstance(a, bool)
            and isinstance(b, (int, float)) and not isinstance(b, bool)
            and a == b)


def _g_enum(node, value, compiled, fail):
    if node.enum is None:
        return OK
    if any(strict_eq(m, value) or _num_cross_eq(m, value) for m in node.enum):
        return OK
    return {"enum": list(node.enum), "value": value}


def _g_not(node, value, compiled, fail):
    if node.not_ is None or not _passes(node.not_, value, compiled):
        return OK
    return {"not": Atom("ok"), "value": value}


def _g_all_of(node, value, compiled, fail):
    if not node.all_of:
        return OK
    errs = [_reason(s, value, compiled, fail) for s in node.all_of]
    bad = [e for e in errs if e is not None]
    return {"all_of": bad, "value": value} if bad else OK


def _g_any_of(node, value, compiled, fail):
    if not node.any_of:
        return OK
    errs = [_reason(s, value, compiled, fail) for s in node.any_of]
    bad = [e for e in errs if e is not None]
    if len(bad) == len(errs):
        return {"any_of": bad, "value": value}
    return OK


def _g_one_of(node, value, compiled, fail):
    if not node.one_of:
        return OK
    errs = [_reason(s, value, compiled, fail) for s in node.one_of]
    okidx = [i for i, e in enumerate(errs) if e is None]
    if len(okidx) == 0:
        return {"one_of": ("error", [e for e in errs if e is not None]),
                "value": value}
    if len(okidx) > 1:
        return {"one_of": ("ok", okidx), "value": value}
    return OK


def _g_const(node, value, compiled, fail):
    if node.const is UNSET:
        return OK
    c = node.const
    if strict_eq(c, value) or _num_cross_eq(c, value):
        return OK
    return {"const": c, "value": value}


def _g_ite(node, value, compiled, fail):
    if node.if_ is None:
        return OK
    if _passes(node.if_, value, compiled):
        if node.then is not None:
            r = _reason(node.then, value, compiled, fail)
            if r is not None:
                return {"then": r}
    else:
        if node.else_ is not None:
            r = _reason(node.else_, value, compiled, fail)
            if r is not None:
                return {"else": r}
    return OK


def _g_validator(node, value, compiled, fail):
    if node.validator is None:
        return OK
    err = node.validator(value)
    if err:
        name = getattr(node.validator, "__name__", "validator")
        return {"validator": Atom(err if isinstance(err, str) else name),
                "value": value}
    return OK


# --- number groups -----------------------------------------------------


def _g_minimum(node, v, compiled, fail):
    if node.minimum is None:
        return OK
    if node.exclusive_minimum is True:
        if v <= node.minimum:
            return {"minimum": node.minimum, "exclusive_minimum": True,
                    "value": v}
    elif v < node.minimum:
        return {"minimum": node.minimum, "value": v}
    return OK


def _g_maximum(node, v, compiled, fail):
    if node.maximum is None:
        return OK
    if node.exclusive_maximum is True:
        if v >= node.maximum:
            return {"maximum": node.maximum, "exclusive_maximum": True,
                    "value": v}
    elif v > node.maximum:
        return {"maximum": node.maximum, "value": v}
    return OK


def _g_excl_max(node, v, compiled, fail):
    m = node.exclusive_maximum
    if m is None or isinstance(m, bool):
        return OK
    return {"exclusive_maximum": m, "value": v} if v >= m else OK


def _g_excl_min(node, v, compiled, fail):
    m = node.exclusive_minimum
    if m is None or isinstance(m, bool):
        return OK
    return {"exclusive_minimum": m, "value": v} if v <= m else OK


def _g_multiple_of(node, v, compiled, fail):
    m = node.multiple_of
    if m is None:
        return OK
    if isinstance(v, int) and not isinstance(v, bool) and isinstance(m, int):
        ok = v % m == 0
    else:
        x = v / m
        ok = x - math.floor(x) == 0
    return OK if ok else {"multiple_of": m, "value": v}


# --- string groups -----------------------------------------------------


def _g_min_length(node, v, compiled, fail):
    if node.min_length is not None and grapheme_length(v) < node.min_length:
        return {"min_length": node.min_length, "value": v}
    return OK


def _g_max_length(node, v, compiled, fail):
    if node.max_length is not None and grapheme_length(v) > node.max_length:
        return {"max_length": node.max_length, "value": v}
    return OK


def _g_pattern(node, v, compiled, fail):
    if node.pattern_re is not None and not node.pattern_re.search(v):
        return {"pattern": re.compile(node.pattern), "value": v}
    return OK


def _g_format(node, v, compiled, fail):
    if node.format is not None and not check_format(node.format, v):
        return {"format": Atom(node.format), "value": v}
    return OK


# --- list groups -------------------------------------------------------


def _g_min_items(node, v, compiled, fail):
    seq = list(v)
    if node.min_items is not None and len(seq) < node.min_items:
        return {"min_items": node.min_items, "value": v}
    return OK


def _g_max_items(node, v, compiled, fail):
    seq = list(v)
    if node.max_items is not None and len(seq) > node.max_items:
        return {"max_items": node.max_items, "value": v}
    return OK


def _g_unique(node, v, compiled, fail):
    if not node.unique_items:
        return OK
    from xema_ray.functions.scalar import distinct_key

    seen = set()
    for e in list(v):
        k = distinct_key(e)
        if k in seen:
            return {"unique_items": True, "value": v}
        seen.add(k)
    return OK


def _g_items(node, v, compiled, fail):
    if node.items is None:
        return OK
    seq = list(v)
    out = []
    if isinstance(node.items, list):
        for i, item in enumerate(seq):
            if i < len(node.items):
                r = _reason(node.items[i], item, compiled, fail)
                if r is not None:
                    out.append((i, r))
            elif node.additional_items is False:
                out.append((i, {"additional_items": False}))
            elif isinstance(node.additional_items, SchemaNode):
                r = _reason(node.additional_items, item, compiled, fail)
                if r is not None:
                    out.append((i, r))
            if out and fail == "immediately":
                break
    else:
        sub = node.items
        if sub.bool_schema is False and seq:
            return {"type": False, "value": v}
        if sub.bool_schema is None:
            for i, item in enumerate(seq):
                r = _reason(sub, item, compiled, fail)
                if r is not None:
                    out.append((i, r))
                    if fail == "immediately":
                        break
    return {"items": out} if out else OK


def _g_contains(node, v, compiled, fail):
    if node.contains is None:
        return OK
    seq = list(v)
    if any(_passes(node.contains, e, compiled) for e in seq):
        return OK
    fails = [(i, _reason(node.contains, e, compiled, fail))
             for i, e in enumerate(seq)]
    return {"contains": [(i, r) for i, r in fails if r is not None],
            "value": v}


# --- map groups --------------------------------------------------------


def _as_map(v):
    return dict(v) if _is_keyword_list(v) else v


def _g_module(node, v, compiled, fail):
    if node.module is None:
        return OK
    mod = v.get("__struct__") if isinstance(v, dict) else None
    if mod != node.module:
        return {"module": Atom(node.module), "value": v}
    return OK


def _g_size(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict):
        return OK
    n = len(m)
    if node.min_properties is not None and n < node.min_properties:
        return {"min_properties": node.min_properties, "value": v}
    if node.max_properties is not None and n > node.max_properties:
        return {"max_properties": node.max_properties, "value": v}
    return OK


def _g_keys(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict) or node.keys is None:
        return OK
    if node.keys == "atoms" and any(not isinstance(k, Atom) for k in m):
        return {"keys": Atom("atoms"), "value": v}
    if node.keys == "strings" and any(
        not isinstance(k, str) or isinstance(k, Atom) for k in m
    ):
        return {"keys": Atom("strings"), "value": v}
    return OK


def _g_required(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict) or node.required is None:
        return OK
    missing = [k for k in node.required if k not in m]
    if missing:
        return {"required": sorted(missing, key=_term_order)}
    return OK


def _g_property_names(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict) or node.property_names is None:
        return OK
    bad = []
    for key in m:
        r = _reason(node.property_names, str(key), compiled, fail)
        if r is not None:
            bad.append((key, r))
    if bad:
        return {"property_names": sorted(bad, key=lambda kv: _term_order(kv[0])),
                "value": sorted(m.keys(), key=_term_order)}
    return OK


def _g_dependencies(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict) or node.dependencies is None:
        return OK
    # the reference's reduce_while halts at the FIRST failing dependency
    # key, and list deps report the first missing antecedent
    for key in sorted(node.dependencies, key=_term_order):
        dep = node.dependencies[key]
        if key not in m:
            continue
        if isinstance(dep, list):
            for d in dep:
                if d not in m:
                    return {"dependencies": {key: d}}
        else:
            r = _reason(dep, v if _is_keyword_list(v) else m, compiled, fail)
            if r is not None:
                return {"dependencies": {key: r}}
    return OK


def _g_all_properties(node, v, compiled, fail):
    m = _as_map(v)
    if not isinstance(m, dict):
        return OK
    props: dict = {}
    declared = node.properties or {}
    pattern_res = node.pattern_props_re or []
    # phase order mirrors all_properties (validator.ex:798-803): patterns
    # BEFORE properties — under :immediately the first failing phase wins
    pattern_fails: dict = {}
    for regex, sub in pattern_res:
        for key in m:
            if isinstance(key, str) and regex.search(str(key)):
                r = _reason(sub, m[key], compiled, fail)
                if r is not None and key not in pattern_fails:
                    pattern_fails[key] = r
    if fail == "immediately" and pattern_fails:
        first = sorted(pattern_fails.items(), key=lambda kv: _term_order(kv[0]))[0]
        return {"properties": dict([first])}
    props.update(pattern_fails)
    for key, sub in declared.items():
        if key not in m:
            continue
        r = _reason(sub, m[key], compiled, fail)
        if r is not None and key not in props:
            props[key] = r
    ap = node.additional_properties
    if ap is not None and ap is not True and ap != "delete":
        for key in m:
            if key == "__struct__":
                continue
            if any(key == d for d in declared):
                continue
            if any(isinstance(key, str) and r.search(str(key))
                   for r, _ in pattern_res):
                continue
            if ap is False:
                props[key] = {"additional_properties": False}
            else:
                r = _reason(ap, m[key], compiled, fail)
                if r is not None:
                    props[key] = r
    if not props:
        return OK
    items = sorted(props.items(), key=lambda kv: _term_order(kv[0]))
    if fail == "immediately":
        items = items[:1]
    return {"properties": dict(items)}


# ----------------------------------------------------------------------
# formatter (validation_error.ex:121-411)
# ----------------------------------------------------------------------


def format_error(reason) -> str:
    """Render a reason (map, or the finally-mode LIST of group reasons) —
    list reasons print in reverse list order, matching travers_errors'
    accumulate-and-reverse mechanics."""
    if isinstance(reason, list):
        lines: list = []
        for item in reversed(reason):
            lines += _travers(item, [])
        return "\n".join(lines)
    return "\n".join(_travers(reason, []))


def validation_message(schema, value: Any, fail: str = "early") -> Optional[str]:
    """The reference's ``Exception.message`` for validating ``value``, or
    ``None`` when valid."""
    r = validation_reason(schema, value, fail=fail)
    return None if r is None else format_error(r)


def _travers(error: dict, path: list) -> list:
    lines = _fmt(error, path)
    if "properties" in error and isinstance(error.get("properties"), dict):
        for key, sub in error["properties"].items():
            lines += _travers(sub, path + [key])
    if "items" in error and isinstance(error.get("items"), list):
        for idx, sub in error["items"]:
            lines += _travers(sub, path + [idx])
    return lines


def _at_path(path: list) -> str:
    if not path:
        return "."
    return f", at {elixir_inspect(list(path))}."


def _indent(lines: list) -> list:
    return [_INDENT + l for l in lines]


def _fmt(e: dict, path: list) -> list:
    i = elixir_inspect
    if "minimum" in e and e.get("exclusive_minimum") is True:
        v, m = e["value"], e["minimum"]
        if v == m:
            return [f"Value {i(v)} equals exclusive minimum value of {i(m)}"
                    + _at_path(path)]
        return [f"Value {i(v)} is less than minimum value of {i(m)}" + _at_path(path)]
    if "exclusive_minimum" in e and "minimum" not in e:
        # draft-6 clause pattern-matches value against the bound STRICTLY
        # (%{exclusive_minimum: m, value: m} — 2.0 does not match 2)
        v, m = e["value"], e["exclusive_minimum"]
        if strict_eq(v, m):
            return [f"Value {i(m)} equals exclusive minimum value of {i(m)}"
                    + _at_path(path)]
        return [f"Value {i(v)} is less than minimum value of {i(m)}" + _at_path(path)]
    if "minimum" in e:
        return [f"Value {i(e['value'])} is less than minimum value of "
                f"{i(e['minimum'])}" + _at_path(path)]
    if "maximum" in e and e.get("exclusive_maximum") is True:
        v, m = e["value"], e["maximum"]
        if v == m:
            return [f"Value {i(v)} equals exclusive maximum value of {i(m)}"
                    + _at_path(path)]
        return [f"Value {i(v)} exceeds maximum value of {i(m)}" + _at_path(path)]
    if "exclusive_maximum" in e and "maximum" not in e:
        v, m = e["value"], e["exclusive_maximum"]
        if strict_eq(v, m):
            return [f"Value {i(m)} equals exclusive maximum value of {i(m)}"
                    + _at_path(path)]
        return [f"Value {i(v)} exceeds maximum value of {i(m)}" + _at_path(path)]
    if "maximum" in e:
        return [f"Value {i(e['value'])} exceeds maximum value of "
                f"{i(e['maximum'])}" + _at_path(path)]
    if "max_length" in e:
        return [f"Expected maximum length of {i(e['max_length'])}, got "
                f"{i(e['value'])}" + _at_path(path)]
    if "min_length" in e:
        return [f"Expected minimum length of {i(e['min_length'])}, got "
                f"{i(e['value'])}" + _at_path(path)]
    if "multiple_of" in e:
        return [f"Value {i(e['value'])} is not a multiple of "
                f"{i(e['multiple_of'])}" + _at_path(path)]
    if "enum" in e:
        return [f"Value {i(e['value'])} is not defined in enum" + _at_path(path)]
    if "keys" in e:
        return [f"Expected {i(e['keys'])} as key, got {i(e['value'])}"
                + _at_path(path)]
    if "min_properties" in e:
        return [f"Expected at least {i(e['min_properties'])} properties, got "
                f"{i(e['value'])}" + _at_path(path)]
    if "max_properties" in e:
        return [f"Expected at most {i(e['max_properties'])} properties, got "
                f"{i(e['value'])}" + _at_path(path)]
    if e.get("additional_properties") is False:
        return [f"Expected only defined properties, got key "
                f"{elixir_inspect(list(path))}."]
    if e.get("additional_items") is False:
        return ["Unexpected additional item" + _at_path(path)]
    if "format" in e:
        return [f"String {i(e['value'])} does not validate against format "
                f"{i(e['format'])}" + _at_path(path)]
    if "then" in e:
        sub = _travers(e["then"], path)
        return [f"Schema for then does not match{_at_path(path)}"] + _indent(sub)
    if "else" in e:
        sub = _travers(e["else"], path)
        return [f"Schema for else does not match{_at_path(path)}"] + _indent(sub)
    if e.get("not") == Atom("ok"):
        return [f"Value is valid against schema from not, got "
                f"{i(e['value'])}" + _at_path(path)]
    if "contains" in e:
        out = [f"No items match contains{_at_path(path)}"]
        subs: list = []
        for idx, r in e["contains"]:
            subs += _travers(r, path + [idx])
        return out + _indent(subs)
    if "any_of" in e:
        out = [f"No match of any schema{_at_path(path)}"]
        subs = []
        for r in e["any_of"]:
            subs += _travers(r, path)
        return out + _indent(subs)
    if "all_of" in e:
        out = [f"No match of all schema{_at_path(path)}"]
        subs = []
        for r in e["all_of"]:
            subs += _travers(r, path)
        return out + _indent(subs)
    if "one_of" in e:
        tag, payload = e["one_of"]
        if tag == "error":
            out = [f"No match of any schema{_at_path(path)}"]
            subs = []
            for r in payload:
                subs += _travers(r, path)
            return out + _indent(subs)
        return [f"More as one schema matches (indexes: "
                f"{elixir_inspect(list(payload))})" + _at_path(path)]
    if "required" in e:
        return [f"Required properties are missing: "
                f"{elixir_inspect(list(e['required']))}" + _at_path(path)]
    if "property_names" in e:
        out = [f"Invalid property names{_at_path(path)}"]
        subs = [f"{elixir_inspect(k)} : {' '.join(_travers(r, []))}"
                for k, r in e["property_names"]]
        return out + _indent(subs)
    if "dependencies" in e:
        msgs = []
        for key, reason in sorted(e["dependencies"].items(),
                                  key=lambda kv: _term_order(kv[0])):
            if isinstance(reason, dict):
                sub = "\n".join(_indent(_travers(reason, path)))
                msgs.append(f"Dependencies for {elixir_inspect(key)} failed"
                            f"{_at_path(path)}\n{sub}")
            else:
                msgs.append(f"Dependencies for {elixir_inspect(key)} failed"
                            f"{_at_path(path)} Missing required key "
                            f"{elixir_inspect(reason)}.")
        return ["\n".join(msgs)]
    if "min_items" in e:
        return [f"Expected at least {i(e['min_items'])} items, got "
                f"{i(e['value'])}" + _at_path(path)]
    if "max_items" in e:
        return [f"Expected at most {i(e['max_items'])} items, got "
                f"{i(e['value'])}" + _at_path(path)]
    if e.get("unique_items") is True:
        return [f"Expected unique items, got {i(e['value'])}" + _at_path(path)]
    if "const" in e:
        return [f"Expected {i(e['const'])}, got {i(e['value'])}" + _at_path(path)]
    if "pattern" in e:
        return [f"Pattern {i(e['pattern'])} does not match value "
                f"{i(e['value'])}" + _at_path(path)]
    if "module" in e:
        return [f"Expected {i(e['module'])}, got {i(e['value'])}" + _at_path(path)]
    if "validator" in e:
        return [f"Validator fails with {i(e['validator'])} for value "
                f"{i(e['value'])}" + _at_path(path)]
    if "type" in e and e["type"] is False:
        return ["Schema always fails validation" + _at_path(path)]
    if "type" in e:
        t = e["type"]
        ts = elixir_inspect(t if not isinstance(t, list) else list(t))
        return [f"Expected {ts}, got {i(e['value'])}" + _at_path(path)]
    if "properties" in e or "items" in e:
        return []
    return ["Unexpected error" + _at_path(path)]
