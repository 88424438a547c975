"""Cast / coercion — convert data *toward* the schema, then validate
(reference ``Xema.cast/2``, lib/xema.ex:713-739; conversion tables
lib/xema/castable.ex; recursion lib/xema.ex:741-945).

Pinned semantics:

* string→integer/float requires a FULL parse ("5x" fails;
  castable/helper.ex:31-43); string→number picks float iff the string
  contains "." (castable.ex:80-84); only "true"/"false" cast to boolean
  (castable.ex:62-64).
* int→float is exact ×1.0; float→integer is NOT a cast (castable.ex:138-155).
* struct modules Decimal/Date/Time/DateTime/NaiveDateTime parse from ISO
  strings (castable.ex:45-60); represented in Python by
  decimal.Decimal / datetime.date / time / datetime.
* containers recurse with per-key schema lookup properties →
  pattern_properties → additional_properties (xema.ex:987-1005);
  ``required`` is checked BEFORE casting children (xema.ex:947-975);
  ``additional_properties: :delete`` strips undeclared keys
  (xema.ex:1007-1019); ``default`` fills missing properties after
  (xema.ex:1021-1069, value / callable forms).
* combinators cast through their branches in REVERSE order, first success
  wins (xema.ex:1078-1146).
* a custom ``caster`` on the node runs before the Castable tables
  (xema.ex:762-797).

``cast(schema, value)`` validates the result (like ``Xema.cast``) and
raises :class:`CastError` / returns violations accordingly.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal, InvalidOperation
from typing import Any, Optional

from xema_ray.functions.scalar import Atom, _is_keyword_list, validate_value
from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode
from xema_ray.schema.builder import resolve_pointer


class CastError(ValueError):
    def __init__(self, path: tuple, to: Any, value: Any, message: Optional[str] = None):
        self.path = "/" + "/".join(str(p) for p in path) if path else "/"
        self.to = to
        self.value = value
        msg = message or f"cannot cast {value!r} to {to} at {self.path}"
        super().__init__(msg)


_STRUCT_MODULES = {"Decimal", "Date", "Time", "DateTime", "NaiveDateTime"}


def cast_value(schema, value: Any, additional_properties: Optional[str] = None) -> Any:
    """Cast ``value`` toward ``schema`` (no post-validation).  Raises
    :class:`CastError` on inconvertible input."""
    if isinstance(schema, CompiledSchema):
        compiled, node = schema, schema.root
    else:
        compiled, node = None, schema
    return _cast(node, value, compiled, (), additional_properties)


def cast(schema, value: Any, additional_properties: Optional[str] = None,
         fail: str = "early"):
    """``Xema.cast``: convert then validate.  Returns ``(value, violations)``."""
    out = cast_value(schema, value, additional_properties)
    return out, validate_value(schema, out, fail=fail)


def _deref(node: SchemaNode, compiled):
    # cycle guard as in kernels._deref: a pure-ref cycle (a -> b -> a via
    # $ref, which compile_schema accepts) must not loop forever.
    seen = set()
    while node.ref is not None and compiled is not None:
        if id(node) in seen:
            raise CastError((), node.ref, None,
                            f"circular pure-$ref chain at {node.ref!r}")
        seen.add(id(node))
        node = resolve_pointer(compiled, node.ref)
    return node


def _cast(node: SchemaNode, value, compiled, path, ap_opt):
    node = _deref(node, compiled)
    if node.bool_schema is not None:
        return value
    if node.caster is not None:
        value = node.caster(value)

    if isinstance(value, (list, tuple, dict)):
        value = _cast_children(node, value, compiled, path, ap_opt)

    value = _castable(node, value, path)
    value = _cast_combiner(node, value, compiled, path, ap_opt)
    return value


def _cast_combiner(node: SchemaNode, value, compiled, path, ap_opt):
    """Combiner casts (xema.ex:1078-1138).  any/one: each branch runs a
    FULL cast+validate on the input; the first branch (in declaration
    order) that succeeds wins — the reference's reversed reduce keeps
    overwriting, so the lowest-index success is the final result.  all:
    the data CHAINS through ``do_cast`` of each branch (declaration-first
    applied last, no per-branch validation).  All branches failing is a
    CastError in every combiner."""
    if node.any_of:
        kind, branches = "any_of", node.any_of
    elif node.all_of:
        kind, branches = "all_of", node.all_of
    elif node.one_of:
        kind, branches = "one_of", node.one_of
    else:
        return value

    if kind in ("any_of", "one_of"):
        for sub in branches:
            subn = _deref(sub, compiled)
            try:
                out = _cast(subn, value, compiled, path, ap_opt)
            except CastError:
                continue
            if not validate_value(
                CompiledSchema(root=subn,
                               refs=compiled.refs if compiled else {}),
                out, fail="immediately",
            ):
                return out
        raise CastError(path, kind, value)

    # all_of: chain, tolerate partial failures if at least one branch cast
    data = value
    errors = 0
    for sub in reversed(branches):
        try:
            data = _cast(_deref(sub, compiled), data, compiled, (), ap_opt)
        except CastError:
            errors += 1
    if errors >= len(branches):
        raise CastError(path, kind, value)
    return data


# ----------------------------------------------------------------------
# the Castable conversion tables
# ----------------------------------------------------------------------


def _castable(node: SchemaNode, value, path):
    types = node.types
    if types is None or types == ("any",):
        return value
    if len(types) == 1:
        return _cast_to(types[0], node, value, path)
    # union: first type that casts wins (castable/helper.ex:21-29)
    for t in types:
        try:
            return _cast_to(t, node, value, path)
        except CastError:
            continue
    raise CastError(path, list(types), value)


import re as _re

# Elixir Integer.parse / Float.parse full-consume grammars: no leading or
# trailing whitespace, no underscores, no inf/nan words (code-review r2 —
# Python int()/float() accept all of those)
_INT_RE = _re.compile(r"[+-]?[0-9]+\Z")
_FLOAT_RE = _re.compile(r"[+-]?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?\Z")


def _full_int(s: str):
    if not _INT_RE.match(s):
        return None
    return int(s, 10)


def _full_float(s: str):
    if not _FLOAT_RE.match(s):
        return None
    return float(s)


def _cast_to(t: str, node: SchemaNode, v, path):
    err = lambda: CastError(path, t, v)

    if t == "any":
        return v
    if t == "nil":
        if v is None:
            return None
        raise err()
    if t == "boolean":
        if isinstance(v, bool):
            return v
        if v == "true":
            return True
        if v == "false":
            return False
        raise err()
    if t == "integer":
        if isinstance(v, bool):
            raise err()
        if isinstance(v, int):
            return v
        if isinstance(v, str):
            out = _full_int(v)
            if out is None:
                raise err()
            return out
        raise err()
    if t == "float":
        if isinstance(v, bool):
            raise err()
        if isinstance(v, float):
            return v
        if isinstance(v, int):
            return v * 1.0
        if isinstance(v, str):
            out = _full_float(v)
            if out is None:
                raise err()
            return out
        raise err()
    if t == "number":
        if isinstance(v, bool):
            raise err()
        if isinstance(v, (int, float)):
            return v
        if isinstance(v, str):
            out = _full_float(v) if "." in v else _full_int(v)
            if out is None:
                raise err()
            return out
        raise err()
    if t == "string":
        if isinstance(v, str) and not isinstance(v, Atom):
            return v
        if isinstance(v, Atom):
            return str(v)
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return _num_to_string(v)
        if v is None:
            raise err()
        raise err()
    if t == "atom":
        if isinstance(v, (Atom, bool)) or v is None:
            return v
        if isinstance(v, str):
            # to_existing_atom: only strings naming a known atom cast
            if not Atom.exists(v):
                raise err()
            return Atom(v)
        raise err()
    if t == "list":
        if isinstance(v, list):
            return v
        if isinstance(v, tuple):
            return list(v)
        raise err()
    if t == "tuple":
        if isinstance(v, tuple):
            return v
        if isinstance(v, list):
            if _is_keyword_list(v):
                raise err()
            return tuple(v)
        raise err()
    if t == "map":
        # keys cast to the schema's key kind (castable.ex:289-305);
        # converted-key collisions are ambiguous
        if isinstance(v, dict):
            return _cast_map_keys(v.items(), node.keys, path, v)
        if isinstance(v, list):
            if not v:
                return {}
            if _is_keyword_list(v):
                return _cast_map_keys(v, node.keys, path, v)
            raise err()
        raise err()
    if t == "keyword":
        # keys cast to atoms (castable.ex:268-287)
        if isinstance(v, list):
            if not v:
                return v
            if _is_keyword_list(v):
                return v
            raise err()
        if isinstance(v, dict):
            out = []
            seen = set()
            for k, val in v.items():
                ak = _cast_key("atoms", k, path, v)
                if ak in seen:
                    raise CastError(path, "keyword", v, f"ambiguous key {ak!r}")
                seen.add(ak)
                out.append((ak, val))
            return out
        raise err()
    if t == "struct":
        return _cast_struct(node.module, v, path)
    raise err()


def _cast_map_keys(items, keys: Optional[str], path, orig) -> dict:
    out: dict = {}
    for k, val in items:
        ck = _cast_key(keys, k, path, orig)
        if ck in out:
            raise CastError(path, "map", orig, f"ambiguous key {ck!r}")
        out[ck] = val
    return out


def _num_to_string(v) -> str:
    if isinstance(v, int):
        return str(v)
    return repr(v)  # float → shortest repr, like Elixir to_string/1


def _cast_struct(module: Optional[str], v, path):
    err = lambda to: CastError(path, to or "struct", v)
    if module in (None, ""):
        # only maps cast to a bare :struct (castable.ex:262; a keyword
        # list is "cannot cast [foo: 6] to :struct", cast/struct_test:67)
        if isinstance(v, dict):
            return v
        raise err("struct")
    if module == "Decimal":
        if isinstance(v, Decimal):
            return v
        if isinstance(v, (int, float)):
            return Decimal(str(v))
        if isinstance(v, str):
            try:
                return Decimal(v)
            except InvalidOperation:
                raise err("Decimal") from None
        raise err("Decimal")
    if module == "Date":
        if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
            return v
        if isinstance(v, str):
            try:
                return dt.date.fromisoformat(v)
            except ValueError:
                raise err("Date") from None
        raise err("Date")
    if module == "Time":
        if isinstance(v, dt.time):
            return v
        if isinstance(v, str):
            try:
                return dt.time.fromisoformat(v)
            except ValueError:
                raise err("Time") from None
        raise err("Time")
    if module in ("DateTime", "NaiveDateTime"):
        if isinstance(v, dt.datetime):
            return v
        if isinstance(v, str):
            try:
                return dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            except ValueError:
                raise err(module) from None
        raise err(module)
    # user struct: tagged dict with ATOM field keys (castable Map.fields →
    # cast_key(:atoms) → struct!, helper.ex:69-89)
    if isinstance(v, dict) or _is_keyword_list(v):
        items = v.items() if isinstance(v, dict) else v
        out = {}
        for k, val in items:
            if k == "__struct__":
                continue
            out[_cast_key("atoms", k, path, v)] = val
        out["__struct__"] = module
        return out
    raise err(module)


# ----------------------------------------------------------------------
# container recursion (xema.ex:799-945)
# ----------------------------------------------------------------------


def _key_type(node: SchemaNode) -> Optional[str]:
    """The key kind properties are declared in: keyword/struct schemas are
    atom-keyed; map schemas use the ``keys`` option (xema.ex:832)."""
    types = node.types or ()
    if "keyword" in types or "struct" in types:
        return "atoms"
    return node.keys


def _key_to(key_type: Optional[str], key):
    """Convert a DATA key to the schema's key kind for property LOOKUP
    only — output keeps the original key (xema.ex:1149-1153).  Soft: a
    string with no existing atom simply doesn't match (no registration)."""
    if key_type == "atoms" and isinstance(key, str) and not isinstance(key, Atom):
        return Atom(key, register=False)
    if key_type == "strings" and isinstance(key, Atom):
        return str(key)
    return key


def _cast_key(key_type: Optional[str], key, path, orig):
    """HARD key cast for container conversion output (castable.ex cast_key):
    string → atom requires the atom to EXIST (to_existing_atom)."""
    if key_type == "atoms" and isinstance(key, str) and not isinstance(key, Atom):
        if not Atom.exists(key):
            raise CastError(path, "atom", orig,
                            f"key {key!r} has no existing atom")
        return Atom(key)
    if key_type == "strings" and isinstance(key, Atom):
        return str(key)
    return key


def _lookup_prop_schema(node: SchemaNode, key):
    """properties → pattern_properties → additional (xema.ex:987-1005);
    additional_properties False acts as 'no schema'."""
    key = _key_to(_key_type(node), key)
    if node.properties and key in node.properties:
        return node.properties[key]
    if node.pattern_props_re:
        for regex, sub in node.pattern_props_re:
            if isinstance(key, str) and regex.search(str(key)):
                return sub
    ap = node.additional_properties
    if isinstance(ap, SchemaNode):
        return ap
    return None


def _check_required(node: SchemaNode, data, path):
    """Required-key check before casting children (xema.ex:947-975): data
    keys are cast to the schema's key kind (default :atoms) first, so a
    string-keyed map satisfies an atom required list."""
    if node.required is None:
        return
    kt = _key_type(node) or "atoms"
    keys = data.keys() if isinstance(data, dict) else (k for k, _ in data)
    present = {_key_to(kt, k) for k in keys}
    missing = sorted(str(k) for k in node.required
                     if _key_to(kt, k) not in present)
    if missing:
        raise CastError(path, node.types[0] if node.types else "map", data,
                        f"missing required keys for cast: {missing}")


def _cast_children(node: SchemaNode, value, compiled, path, ap_opt):
    types = node.types or ()
    if isinstance(value, dict) and (
        "map" in types or "struct" in types or "keyword" in types
        or "any" in types or not types
    ):
        _check_required(node, value, path)
        out = {}
        for k, v in value.items():
            sub = _lookup_prop_schema(node, k)
            if sub is not None:
                out[k] = _cast(_deref(sub, compiled), v, compiled, path + (k,), ap_opt)
            else:
                out[k] = v
        if ap_opt == "delete" and node.additional_properties is False:
            out = {k: v for k, v in out.items() if _keep_key(node, k)}
        out = _add_defaults(node, out)
        return out
    if isinstance(value, (list, tuple)) and not _is_keyword_list(list(value)):
        items = node.items
        seq = list(value)
        if isinstance(items, SchemaNode):
            seq = [
                _cast(_deref(items, compiled), v, compiled, path + (i,), ap_opt)
                for i, v in enumerate(seq)
            ]
        elif isinstance(items, list):
            out_seq = []
            for i, v in enumerate(seq):
                if i < len(items):
                    out_seq.append(_cast(_deref(items[i], compiled), v, compiled,
                                         path + (i,), ap_opt))
                elif isinstance(node.additional_items, SchemaNode):
                    out_seq.append(_cast(_deref(node.additional_items, compiled), v,
                                         compiled, path + (i,), ap_opt))
                else:
                    out_seq.append(v)
            seq = out_seq
        return tuple(seq) if isinstance(value, tuple) else seq
    if _is_keyword_list(value if isinstance(value, list) else []):
        _check_required(node, value, path)
        out = []
        for k, v in value:
            sub = _lookup_prop_schema(node, k)
            if sub is not None:
                out.append((k, _cast(_deref(sub, compiled), v, compiled,
                                     path + (k,), ap_opt)))
            else:
                out.append((k, v))
        if ap_opt == "delete" and node.additional_properties is False:
            out = [(k, v) for k, v in out if _keep_key(node, k)]
        out = _add_defaults_kw(node, out)
        return out
    return value


def _keep_key(node: SchemaNode, k) -> bool:
    """``additional_properties: :delete`` key filter (xema.ex:1007-1019 +
    key?/3): with BOTH declared properties and pattern_properties present a
    key must match both lists to survive — the reference's && quirk."""
    kt = _key_type(node)
    ck = _key_to(kt, k)
    declared = list(node.properties or ())
    patterns = [r for r, _ in (node.pattern_props_re or [])]
    in_decl = any(ck == d for d in declared)
    in_pat = any(r.search(str(ck)) for r in patterns)
    if declared and patterns:
        return in_decl and in_pat
    if declared:
        return in_decl
    if patterns:
        return in_pat
    return False


def _add_defaults_kw(node: SchemaNode, data: list) -> list:
    if not node.properties:
        return data
    present = {k for k, _ in data}
    for key, sub in node.properties.items():
        if sub.default is UNSET or key in present:
            continue
        d = sub.default
        data.append((key, d() if callable(d) else d))
    return data


def _add_defaults(node: SchemaNode, data: dict) -> dict:
    """Fill missing properties with defaults (value or callable).  The
    presence check looks for BOTH key kinds — merge_defaults probes
    ``Map.get(acc, key)`` AND ``Map.get(acc, to_string(key))``
    (xema.ex:1055-1060), so a string-keyed value blocks an atom-keyed
    default."""
    if not node.properties:
        return data
    for key, sub in node.properties.items():
        if sub.default is UNSET:
            continue
        alt = str(key) if isinstance(key, Atom) else Atom(key, register=False)
        if key in data or alt in data:
            continue
        d = sub.default
        data[key] = d() if callable(d) else d
    return data
