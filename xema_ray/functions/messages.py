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


def validation_reason(schema, value: Any) -> Optional[dict]:
    """Reference-shaped reason map for an invalid value, or ``None``."""
    if isinstance(schema, CompiledSchema):
        compiled, node = schema, schema.root
    else:
        compiled, node = None, schema
    return _reason(node, value, compiled)


def _deref(node: SchemaNode, compiled):
    seen = set()
    while node.ref is not None and compiled is not None and id(node) not in seen:
        seen.add(id(node))
        from xema_ray.schema.builder import resolve_pointer

        node = resolve_pointer(compiled, node.ref)
    return node


def _reason(node: SchemaNode, value, compiled) -> Optional[dict]:
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

    r = _generic(node, value, compiled)
    if r is not None:
        return r
    r = _typed(matched, node, value, compiled)
    if r is not None:
        return r
    if node.validator is not None:
        err = node.validator(value)
        if err:
            name = getattr(node.validator, "__name__", "validator")
            return {"validator": Atom(err if isinstance(err, str) else name),
                    "value": value}
    return OK


def _passes(node: SchemaNode, value, compiled) -> bool:
    return _reason(node, value, compiled) is None


def _generic(node: SchemaNode, value, compiled) -> Optional[dict]:
    # chain order mirrors the scalar validator (enum, not, all_of, any_of,
    # one_of, const, if/then/else)
    if node.enum is not None:
        if not any(
            strict_eq(m, value)
            or (isinstance(m, (int, float)) and not isinstance(m, bool)
                and isinstance(value, (int, float)) and not isinstance(value, bool)
                and m == value)
            for m in node.enum
        ):
            return {"enum": list(node.enum), "value": value}
    if node.not_ is not None:
        if _passes(node.not_, value, compiled):
            return {"not": Atom("ok"), "value": value}
    if node.all_of:
        errs = [_reason(s, value, compiled) for s in node.all_of]
        bad = [e for e in errs if e is not None]
        if bad:
            return {"all_of": bad, "value": value}
    if node.any_of:
        errs = [_reason(s, value, compiled) for s in node.any_of]
        bad = [e for e in errs if e is not None]
        if len(bad) == len(errs):
            return {"any_of": bad, "value": value}
    if node.one_of:
        errs = [_reason(s, value, compiled) for s in node.one_of]
        okidx = [i for i, e in enumerate(errs) if e is None]
        if len(okidx) == 0:
            return {"one_of": ("error", [e for e in errs if e is not None]),
                    "value": value}
        if len(okidx) > 1:
            return {"one_of": ("ok", okidx), "value": value}
    if node.const is not UNSET:
        c = node.const
        if not (strict_eq(c, value) or (
            isinstance(c, (int, float)) and not isinstance(c, bool)
            and isinstance(value, (int, float)) and not isinstance(value, bool)
            and c == value
        )):
            return {"const": c, "value": value}
    if node.if_ is not None:
        if _passes(node.if_, value, compiled):
            if node.then is not None:
                r = _reason(node.then, value, compiled)
                if r is not None:
                    return {"then": r}
        else:
            if node.else_ is not None:
                r = _reason(node.else_, value, compiled)
                if r is not None:
                    return {"else": r}
    return OK


def _typed(t: str, node: SchemaNode, value, compiled) -> Optional[dict]:
    if t in ("integer", "float", "number"):
        return _number(node, value)
    if t == "string":
        return _string(node, value)
    if t in ("list", "tuple"):
        return _list(node, list(value), compiled, value)
    if t == "keyword":
        return _map(node, dict(value), compiled, orig=value)
    if t == "map" or t == "struct":
        if t == "struct" and node.module is not None:
            mod = value.get("__struct__") if isinstance(value, dict) else None
            if mod != node.module:
                return {"module": Atom(node.module), "value": value}
        if isinstance(value, dict):
            return _map(node, value, compiled)
    return OK


def _number(node: SchemaNode, v) -> Optional[dict]:
    if node.minimum is not None:
        if node.exclusive_minimum is True:
            if v <= node.minimum:
                return {"minimum": node.minimum, "exclusive_minimum": True,
                        "value": v}
        elif v < node.minimum:
            return {"minimum": node.minimum, "value": v}
    if node.maximum is not None:
        if node.exclusive_maximum is True:
            if v >= node.maximum:
                return {"maximum": node.maximum, "exclusive_maximum": True,
                        "value": v}
        elif v > node.maximum:
            return {"maximum": node.maximum, "value": v}
    if node.exclusive_maximum is not None and not isinstance(node.exclusive_maximum, bool):
        if v >= node.exclusive_maximum:
            return {"exclusive_maximum": node.exclusive_maximum, "value": v}
    if node.exclusive_minimum is not None and not isinstance(node.exclusive_minimum, bool):
        if v <= node.exclusive_minimum:
            return {"exclusive_minimum": node.exclusive_minimum, "value": v}
    if node.multiple_of is not None:
        m = node.multiple_of
        if isinstance(v, int) and not isinstance(v, bool) and isinstance(m, int):
            ok = v % m == 0
        else:
            x = v / m
            ok = x - math.floor(x) == 0
        if not ok:
            return {"multiple_of": m, "value": v}
    return OK


def _string(node: SchemaNode, v: str) -> Optional[dict]:
    if node.min_length is not None and grapheme_length(v) < node.min_length:
        return {"min_length": node.min_length, "value": v}
    if node.max_length is not None and grapheme_length(v) > node.max_length:
        return {"max_length": node.max_length, "value": v}
    if node.pattern_re is not None and not node.pattern_re.search(v):
        return {"pattern": re.compile(node.pattern), "value": v}
    if node.format is not None and not check_format(node.format, v):
        return {"format": Atom(node.format), "value": v}
    return OK


def _list(node: SchemaNode, seq: list, compiled, orig) -> Optional[dict]:
    if node.min_items is not None and len(seq) < node.min_items:
        return {"min_items": node.min_items, "value": orig}
    if node.max_items is not None and len(seq) > node.max_items:
        return {"max_items": node.max_items, "value": orig}
    if node.unique_items:
        from xema_ray.functions.scalar import distinct_key

        seen = set()
        for e in seq:
            k = distinct_key(e)
            if k in seen:
                return {"unique_items": True, "value": orig}
            seen.add(k)
    if node.items is not None:
        out = []
        if isinstance(node.items, list):
            for i, item in enumerate(seq):
                if i < len(node.items):
                    r = _reason(node.items[i], item, compiled)
                    if r is not None:
                        out.append((i, r))
                elif node.additional_items is False:
                    out.append((i, {"additional_items": False}))
                elif isinstance(node.additional_items, SchemaNode):
                    r = _reason(node.additional_items, item, compiled)
                    if r is not None:
                        out.append((i, r))
        else:
            sub = node.items
            if sub.bool_schema is False and seq:
                return {"type": False, "value": orig}
            if sub.bool_schema is None:
                for i, item in enumerate(seq):
                    r = _reason(sub, item, compiled)
                    if r is not None:
                        out.append((i, r))
        if out:
            return {"items": out}
    if node.contains is not None:
        if not any(_passes(node.contains, e, compiled) for e in seq):
            fails = [(i, _reason(node.contains, e, compiled))
                     for i, e in enumerate(seq)]
            return {"contains": [(i, r) for i, r in fails if r is not None],
                    "value": orig}
    return OK


def _map(node: SchemaNode, v: dict, compiled, orig=None) -> Optional[dict]:
    orig = v if orig is None else orig
    n = len(v)
    if node.min_properties is not None and n < node.min_properties:
        return {"min_properties": node.min_properties, "value": orig}
    if node.max_properties is not None and n > node.max_properties:
        return {"max_properties": node.max_properties, "value": orig}
    if node.keys == "atoms" and any(not isinstance(k, Atom) for k in v):
        return {"keys": Atom("atoms"), "value": orig}
    if node.keys == "strings" and any(
        not isinstance(k, str) or isinstance(k, Atom) for k in v
    ):
        return {"keys": Atom("strings"), "value": orig}
    if node.required is not None:
        missing = [k for k in node.required if k not in v]
        if missing:
            return {"required": sorted(missing, key=_term_order)}
    if node.property_names is not None:
        bad = []
        for key in v:
            name = str(key)
            r = _reason(node.property_names, name, compiled)
            if r is not None:
                bad.append((key, r))
        if bad:
            return {"property_names": sorted(bad, key=lambda kv: _term_order(kv[0])),
                    "value": sorted(v.keys(), key=_term_order)}
    if node.dependencies is not None:
        deps = {}
        for key, dep in node.dependencies.items():
            if key not in v:
                continue
            if isinstance(dep, list):
                for d in dep:
                    if d not in v:
                        deps[key] = d
            else:
                r = _reason(dep, orig if _is_keyword_list(orig) else v, compiled)
                if r is not None:
                    deps[key] = r
        if deps:
            return {"dependencies": deps}
    # patterns → properties → additionals, all collected per key
    props: dict = {}
    declared = node.properties or {}
    pattern_res = node.pattern_props_re or []
    for key, sub in declared.items():
        if key not in v:
            continue
        r = _reason(sub, v[key], compiled)
        if r is not None:
            props[key] = r
    for regex, sub in pattern_res:
        for key in v:
            if isinstance(key, str) and regex.search(str(key)):
                r = _reason(sub, v[key], compiled)
                if r is not None and key not in props:
                    props[key] = r
    ap = node.additional_properties
    if ap is not None and ap is not True and ap != "delete":
        for key in v:
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
                r = _reason(ap, v[key], compiled)
                if r is not None:
                    props[key] = r
    if props:
        return {"properties": dict(
            sorted(props.items(), key=lambda kv: _term_order(kv[0])))}
    return OK


# ----------------------------------------------------------------------
# formatter (validation_error.ex:121-411)
# ----------------------------------------------------------------------


def format_error(reason: dict) -> str:
    return "\n".join(_travers(reason, []))


def validation_message(schema, value: Any) -> Optional[str]:
    """The reference's ``Exception.message`` for validating ``value``, or
    ``None`` when valid."""
    r = validation_reason(schema, value)
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
