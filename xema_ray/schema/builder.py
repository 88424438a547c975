"""Schema compiler: Python DSL source → :class:`CompiledSchema`.

The DSL mirrors the reference's ``Xema.new/2`` forms (reference
lib/xema.ex:213-243, builder functions lib/xema/builder.ex):

    compile_schema("integer")
    compile_schema(("integer", {"minimum": 0}))
    compile_schema((["integer", "string"], {"min_length": 2}))
    compile_schema({"properties": {"a": "integer"}, "required": ["a"]})
    compile_schema(("map", {"properties": {...}, "required": [...]}))
    compile_schema(True)   # accept-all boolean schema
    compile_schema(False)  # reject-all

Compilation performs (in the order of the reference pipeline,
lib/xema.ex:296-423 + lib/xema/behaviour.ex:58-223):

1. meta-validation of keyword values (schema_validator.ex analogue),
2. recursive AST build (keyword → sub-SchemaNode, regex compile,
   ``required`` → frozenset),
3. ref registration + resolution: every schema position is registered
   under its JSON pointer; ``$id`` anchors are registered absolutely;
   remote refs go through a pluggable ``loader`` (lib/xema/loader.ex
   analogue — the default refuses, like ``Xema.NoLoader``).

Refs stay as pointer nodes resolved through ``CompiledSchema.refs`` at
validation time; recursion is bounded by data depth, so circular refs
(behaviour.ex:460-510) need no special casing at runtime.  Vectorized
planning derefs non-circular refs at plan time.
"""

from __future__ import annotations

import numbers
import re
from typing import Any, Callable, Optional

from xema_ray.schema.ast import CompiledSchema, SchemaNode, TYPE_NAMES


class SchemaError(ValueError):
    """Invalid schema source (meta-validation failure)."""


_PY_TYPE_ALIASES = {
    int: "integer",
    float: "float",
    str: "string",
    bool: "boolean",
    list: "list",
    tuple: "tuple",
    dict: "map",
    type(None): "nil",
    None: "nil",
}

# camelCase JSON-Schema names → AST slots, shared with the JSON loader
KEYWORD_ALIASES = {
    "additionalItems": "additional_items",
    "additionalProperties": "additional_properties",
    "allOf": "all_of",
    "anyOf": "any_of",
    "oneOf": "one_of",
    "not": "not_",
    "if": "if_",
    "else": "else_",
    "exclusiveMaximum": "exclusive_maximum",
    "exclusiveMinimum": "exclusive_minimum",
    "maxItems": "max_items",
    "maxLength": "max_length",
    "maxProperties": "max_properties",
    "minItems": "min_items",
    "minLength": "min_length",
    "minProperties": "min_properties",
    "multipleOf": "multiple_of",
    "patternProperties": "pattern_properties",
    "propertyNames": "property_names",
    "uniqueItems": "unique_items",
    "contentEncoding": "content_encoding",
    "contentMediaType": "content_media_type",
    "$ref": "ref",
    "$id": "id",
    "$schema": "schema",
    "$comment": "comment",
    "$defs": "definitions",
    "else_": "else_",
    "if_": "if_",
    "not_": "not_",
}

_SUBSCHEMA_SLOTS = {"not_", "if_", "then", "else_", "contains", "property_names"}
_SUBSCHEMA_LIST_SLOTS = {"all_of", "any_of", "one_of"}
_SUBSCHEMA_MAP_SLOTS = {"properties", "pattern_properties", "definitions"}

_VALID_SLOTS = {f for f in SchemaNode.__dataclass_fields__} - {
    "types",
    "bool_schema",
    "pattern_re",
    "pattern_props_re",
}


def _norm_type(t: Any) -> str:
    if isinstance(t, str):
        name = t
    elif isinstance(t, type) or t is None:
        try:
            name = _PY_TYPE_ALIASES[t]
        except KeyError:
            raise SchemaError(f"unknown schema type: {t!r}") from None
    else:
        raise SchemaError(f"unknown schema type: {t!r}")
    # JSON-Schema type vocabulary (reference json_schema.ex:126-197)
    name = {"null": "nil", "object": "map", "array": "list"}.get(name, name)
    if name not in TYPE_NAMES:
        raise SchemaError(f"unknown schema type: {name!r}")
    return name


def _is_number(v: Any) -> bool:
    return isinstance(v, numbers.Real) and not isinstance(v, bool)


def _meta_validate(slot: str, v: Any) -> None:
    """Keyword-value validation (reference lib/xema/schema_validator.ex)."""
    nonneg_int = {"min_length", "max_length", "min_items", "max_items",
                  "min_properties", "max_properties"}
    if slot in nonneg_int:
        if not isinstance(v, int) or isinstance(v, bool) or v < 0:
            raise SchemaError(f"{slot} must be a non-negative integer, got {v!r}")
    elif slot in ("minimum", "maximum"):
        if not _is_number(v):
            raise SchemaError(f"{slot} must be a number, got {v!r}")
    elif slot in ("exclusive_minimum", "exclusive_maximum"):
        if not (_is_number(v) or isinstance(v, bool)):
            raise SchemaError(f"{slot} must be a number or boolean, got {v!r}")
    elif slot == "multiple_of":
        if not _is_number(v) or v <= 0:
            raise SchemaError(f"multiple_of must be a positive number, got {v!r}")
    elif slot == "enum":
        if not isinstance(v, (list, tuple)) or len(v) == 0:
            raise SchemaError(f"enum must be a non-empty list, got {v!r}")
    elif slot == "pattern":
        if not isinstance(v, (str, re.Pattern)):
            raise SchemaError(f"pattern must be a string/regex, got {v!r}")
    elif slot == "required":
        if not isinstance(v, (list, tuple, set, frozenset)) or not all(
            isinstance(k, str) for k in v
        ):
            raise SchemaError(f"required must be a list of string keys, got {v!r}")
    elif slot == "unique_items":
        if not isinstance(v, bool):
            raise SchemaError(f"unique_items must be a boolean, got {v!r}")
    elif slot in ("all_of", "any_of", "one_of"):
        if not isinstance(v, (list, tuple)) or len(v) == 0:
            raise SchemaError(f"{slot} must be a non-empty list of schemas")
    elif slot == "ref":
        if not isinstance(v, str):
            raise SchemaError(f"ref must be a string pointer, got {v!r}")


_UNSET_ALLOW = object()


class _Builder:
    def __init__(self, loader: Optional[Callable] = None):
        self.refs: dict = {}
        self.ref_sites: list = []  # (node, pointer) for resolution checking
        self.optional_sites: set = set()  # data-derived sites, best-effort
        self.base_stack: list = [None]  # $id base-URI scope chain
        self.loader = loader

    # -- source normalization -----------------------------------------

    def build(self, source: Any, path: str = "#") -> SchemaNode:
        if isinstance(source, SchemaNode):
            self._register(path, source)
            return source
        if isinstance(source, bool):
            node = SchemaNode(bool_schema=source)
            self._register(path, node)
            return node
        if isinstance(source, (str, type)) or source is None:
            node = SchemaNode(types=(_norm_type(source),))
            self._register(path, node)
            return node
        if isinstance(source, (list,)) and all(
            isinstance(t, (str, type)) or t is None for t in source
        ):
            node = SchemaNode(types=tuple(_norm_type(t) for t in source))
            self._register(path, node)
            return node
        if isinstance(source, tuple) and len(source) == 2 and isinstance(source[1], dict):
            type_part, kw = source
            if isinstance(type_part, (list, tuple)):
                types = tuple(_norm_type(t) for t in type_part)
            else:
                types = (_norm_type(type_part),)
            return self._build_keywords(kw, types, path)
        if isinstance(source, dict):
            return self._build_keywords(source, None, path)
        raise SchemaError(f"cannot compile schema source: {source!r}")

    def _build_keywords(self, kw: dict, types, path: str) -> SchemaNode:
        node = SchemaNode(types=types)
        self._register(path, node)
        # $id changes the base URI for every ref in scope (RFC base-URI
        # resolution, ref_remote_suite_test.exs "base URI change")
        from urllib.parse import urljoin

        own_id = kw.get("id") or kw.get("$id")
        parent_base = self.base_stack[-1]
        if isinstance(own_id, str):
            base = urljoin(parent_base, own_id) if parent_base else own_id
        else:
            base = parent_base
        self.base_stack.append(base)
        try:
            self._build_keyword_slots(node, kw, path)
        finally:
            self.base_stack.pop()
        if isinstance(own_id, str) and base != own_id:
            # anchor must register under the scope-resolved URI so refs
            # absolutized against the same base resolve (code-review r2)
            node.id = base
        return node

    def _build_keyword_slots(self, node: SchemaNode, kw: dict, path: str) -> None:
        from urllib.parse import urljoin

        allow_value = _UNSET_ALLOW
        for raw_key, value in kw.items():
            slot = KEYWORD_ALIASES.get(raw_key, raw_key)
            if slot == "type":
                if isinstance(value, (list, tuple)):
                    node.types = tuple(_norm_type(t) for t in value)
                else:
                    node.types = (_norm_type(value),)
                continue
            if slot == "allow":  # non-standard extra type (xema.ex:426-443)
                # defer: keyword ORDER must not matter — a later 'type'
                # assignment would overwrite the grafted allow type
                allow_value = value
                continue
            if slot not in _VALID_SLOTS:
                # non-keyword data kept addressable (xema.ex:445-501):
                # node.data keeps the RAW value; schema-shaped values also
                # compile + register so JSON pointers can target them
                # ("#/integer" into [integer: :integer, refToInteger:
                # {:ref, "#/integer"}] — subSchemas.exon)
                node.data = dict(node.data or {})
                node.data[raw_key] = value
                before = len(self.ref_sites)
                try:
                    self.build(value, f"{path}/{_escape(raw_key)}")
                except (SchemaError, TypeError, ValueError):
                    del self.ref_sites[before:]  # plain annotation
                else:
                    # refs inside DATA are best-effort: unresolvable ones
                    # must not fail compilation of the real schema
                    self.optional_sites.update(
                        id(n) for n, _ in self.ref_sites[before:])
                continue
            _meta_validate(slot, value)
            self._set_slot(node, slot, value, path, raw_key)
        if allow_value is not _UNSET_ALLOW:
            extras = allow_value if isinstance(allow_value, (list, tuple)) \
                else [allow_value]
            node.types = tuple(node.types or ("any",)) + tuple(
                _norm_type(t) for t in extras)
        self._compile_patterns(node)
        if node.ref is not None:
            base = self.base_stack[-1]
            if base and "://" in str(base) and "://" not in node.ref \
                    and not node.ref.startswith("#"):
                # relative document ref resolves against the $id scope
                node.ref = urljoin(base, node.ref)
            self.ref_sites.append((node, node.ref))

    def _set_slot(self, node: SchemaNode, slot: str, value: Any, path: str, raw_key: str) -> None:
        sub = f"{path}/{raw_key}"
        if slot in _SUBSCHEMA_SLOTS:
            setattr(node, slot, self.build(value, sub))
        elif slot in _SUBSCHEMA_LIST_SLOTS:
            setattr(
                node, slot,
                [self.build(v, f"{sub}/{i}") for i, v in enumerate(value)],
            )
        elif slot in _SUBSCHEMA_MAP_SLOTS:
            if not isinstance(value, dict):
                raise SchemaError(f"{sub}: {raw_key} must be an object of schemas, got {value!r}")
            if not all(isinstance(k, str) for k in value):
                raise SchemaError(f"{sub}: {raw_key} keys must be strings")
            built = {k: self.build(v, f"{sub}/{_escape(k)}") for k, v in value.items()}
            setattr(node, slot, built)
        elif slot == "items":
            if isinstance(value, list) and not all(
                isinstance(t, (str, type)) or t is None for t in value
            ):
                node.items = [self.build(v, f"{sub}/{i}") for i, v in enumerate(value)]
            elif isinstance(value, list) and all(
                isinstance(t, str) and t in TYPE_NAMES for t in value
            ):
                # a LIST of type names under items is positional — even a
                # single-element one (ref_test.exs "ref for additional
                # items": items: [:integer] + additional_items schema)
                node.items = [self.build(v, f"{sub}/{i}") for i, v in enumerate(value)]
            else:
                node.items = self.build(value, sub)
        elif slot in ("additional_items", "additional_properties"):
            if isinstance(value, bool):
                setattr(node, slot, value)
            elif value == "delete":  # cast option passthrough
                setattr(node, slot, value)
            else:
                setattr(node, slot, self.build(value, sub))
        elif slot == "dependencies":
            if not isinstance(value, dict):
                raise SchemaError(f"{sub}: dependencies must be an object, got {value!r}")
            deps = {}
            for k, v in value.items():
                if isinstance(v, str):
                    deps[k] = [v]
                elif isinstance(v, (list, tuple)) and all(isinstance(x, str) for x in v) and not (
                    len(v) == 2 and isinstance(v, tuple) and isinstance(v[1], dict)
                ):
                    deps[k] = list(v)
                else:
                    deps[k] = self.build(v, f"{sub}/{_escape(k)}")
            node.dependencies = deps
        elif slot == "required":
            node.required = frozenset(value)
        elif slot == "pattern":
            node.pattern = value.pattern if isinstance(value, re.Pattern) else value
        elif slot == "enum":
            node.enum = list(value)
        elif slot == "id":
            node.id = value
        else:
            setattr(node, slot, value)

    def _compile_patterns(self, node: SchemaNode) -> None:
        """Compile regexes at build time (reference schema.ex:367-397)."""
        if node.pattern is not None:
            try:
                node.pattern_re = re.compile(node.pattern)
            except re.error as e:
                raise SchemaError(f"invalid pattern {node.pattern!r}: {e}") from e
        if node.pattern_properties:
            node.pattern_props_re = [
                (re.compile(p), sub) for p, sub in node.pattern_properties.items()
            ]

    # -- ref registration / resolution --------------------------------

    def _register(self, path: str, node: SchemaNode) -> None:
        self.refs[path] = node

    def finalize(self, root: SchemaNode) -> CompiledSchema:
        # register $id anchors (absolute and fragment forms)
        def walk(node: SchemaNode, seen: set) -> None:
            if id(node) in seen:
                return
            seen.add(id(node))
            if node.id:
                self.refs[node.id] = node
                if not node.id.startswith("#"):
                    self.refs[node.id.rstrip("#") + "#"] = node
            for child in _children(node):
                walk(child, seen)

        walk(root, set())
        compiled = CompiledSchema(root=root, refs=self.refs)
        # check every ref site resolves (fetch remote if loader given;
        # bundled draft metaschemas resolve by default)
        for node, pointer in self.ref_sites:
            if not self._resolvable(compiled, pointer):
                optional = id(node) in self.optional_sites
                if not pointer.startswith("#"):
                    try:
                        self._load_remote(compiled, pointer)
                    except (KeyError, OSError) as e:
                        if optional:
                            continue
                        raise SchemaError(f"unresolvable ref: {pointer!r}") from e
                    if not self._resolvable(compiled, pointer):
                        if optional:
                            continue
                        raise SchemaError(f"remote ref not found: {pointer!r}")
                elif not optional:
                    raise SchemaError(f"unresolvable ref: {pointer!r}")
        return compiled

    def _load_remote(self, compiled: CompiledSchema, pointer: str) -> None:
        """Fetch + compile a remote schema, rebasing its internal '#...'
        refs into the '{base}#...' namespace ($id rebasing,
        behaviour.ex:323-395 analogue)."""
        from xema_ray.schema.metaschemas import metaschema_loader

        base = pointer.split("#", 1)[0]
        loader = self.loader or metaschema_loader
        remote_src = loader(base)
        sub = _Builder(loader=self.loader)
        remote_root = sub.build(remote_src)
        sub_compiled = sub.finalize(remote_root)

        seen: set = set()

        def rebase(n: SchemaNode) -> None:
            if id(n) in seen:
                return
            seen.add(id(n))
            if n.ref and n.ref.startswith("#"):
                n.ref = base + n.ref
            for child in _children(n):
                rebase(child)

        rebase(remote_root)
        # data-registered nodes (pointer-addressable non-keyword values)
        # are not in the root's child graph — rebase them too
        for n in list(sub_compiled.refs.values()):
            rebase(n)
        for k, v in sub_compiled.refs.items():
            compiled.refs[base + k if k.startswith("#") else k] = v
        compiled.refs[base] = remote_root
        compiled.refs[base + "#"] = remote_root

    @staticmethod
    def _resolvable(compiled: CompiledSchema, pointer: str) -> bool:
        try:
            resolve_pointer(compiled, pointer)
            return True
        except KeyError:
            return False


def _children(node: SchemaNode):
    """Yield direct sub-SchemaNodes of ``node``."""
    for slot in _SUBSCHEMA_SLOTS:
        v = getattr(node, slot)
        if isinstance(v, SchemaNode):
            yield v
    for slot in _SUBSCHEMA_LIST_SLOTS:
        v = getattr(node, slot)
        if v:
            yield from (s for s in v if isinstance(s, SchemaNode))
    for slot in _SUBSCHEMA_MAP_SLOTS:
        v = getattr(node, slot)
        if v:
            yield from (s for s in v.values() if isinstance(s, SchemaNode))
    if isinstance(node.items, SchemaNode):
        yield node.items
    elif isinstance(node.items, list):
        yield from (s for s in node.items if isinstance(s, SchemaNode))
    for slot in ("additional_items", "additional_properties"):
        v = getattr(node, slot)
        if isinstance(v, SchemaNode):
            yield v
    if node.dependencies:
        yield from (s for s in node.dependencies.values() if isinstance(s, SchemaNode))


def _escape(key: str) -> str:
    return str(key).replace("~", "~0").replace("/", "~1")


def _unescape(seg: str) -> str:
    # URI-fragment pointers percent-encode segments (RFC 6901 §6):
    # "percent%25field" → "percent%field"; then ~1 → /, ~0 → ~
    from urllib.parse import unquote

    return unquote(seg).replace("~1", "/").replace("~0", "~")


def resolve_pointer(compiled: CompiledSchema, pointer: str) -> SchemaNode:
    """Resolve a JSON pointer / $id reference against the compiled schema."""
    if pointer in compiled.refs:
        return compiled.refs[pointer]
    if pointer in ("#", ""):
        return compiled.root
    # URL-encoded pointer segments: "#/definitions/percent%25field"
    from urllib.parse import unquote

    unq = unquote(pointer)
    if unq != pointer and unq in compiled.refs:
        return compiled.refs[unq]
    # relative ref against a registered $id base: {"$id": ".../tree"} + "tree"
    if not pointer.startswith("#"):
        from urllib.parse import urljoin

        for base in list(compiled.refs):
            if "://" in base:
                cand = urljoin(base, pointer)
                if cand in compiled.refs:
                    return compiled.refs[cand]
                if cand.rstrip("#") + "#" in compiled.refs:
                    return compiled.refs[cand.rstrip("#") + "#"]
    # NOTE: do NOT unquote the whole pointer before the walk — "%2F" decodes
    # to "/" and would split one segment into two; _unescape decodes each
    # segment after splitting.
    # try structural walk: "#/definitions/foo/properties/bar"
    if "#" in pointer:
        base, _, frag = pointer.partition("#")
        if base and base in compiled.refs:
            node = compiled.refs[base]
        elif base:
            raise KeyError(pointer)
        else:
            node = compiled.root
    else:
        frag = pointer
        node = compiled.root
    segs = [s for s in frag.split("/") if s]
    for seg in segs:
        seg = _unescape(seg)
        node = _step(node, seg)
        if node is None:
            raise KeyError(pointer)
    return node


def _step(node, seg: str):
    if isinstance(node, _Hold):
        return node.get(seg)
    if isinstance(node, list):
        return node[int(seg)] if seg.isdigit() and int(seg) < len(node) else None
    if not isinstance(node, SchemaNode):
        return None
    slot = KEYWORD_ALIASES.get(seg, seg)
    if slot in ("definitions", "properties", "pattern_properties"):
        return _Hold(getattr(node, slot) or {})
    if slot in _SUBSCHEMA_SLOTS:
        return getattr(node, slot)
    if slot in _SUBSCHEMA_LIST_SLOTS or slot == "items":
        return _Hold(getattr(node, slot))
    return None


class _Hold:
    """Intermediate container while walking a pointer path."""

    def __init__(self, obj):
        self.obj = obj

    def get(self, seg: str):
        if isinstance(self.obj, dict):
            return self.obj.get(seg)
        if isinstance(self.obj, list) and seg.isdigit():
            i = int(seg)
            return self.obj[i] if i < len(self.obj) else None
        if isinstance(self.obj, SchemaNode):
            return _step(self.obj, seg)
        return None


def compile_schema(source: Any, loader: Optional[Callable] = None) -> CompiledSchema:
    """Compile a DSL/JSON-Schema-shaped source into a :class:`CompiledSchema`.

    ``loader`` resolves remote refs (reference lib/xema/loader.ex:11-16);
    the default is to refuse, like ``Xema.NoLoader``.
    """
    b = _Builder(loader=loader)
    root = b.build(source)
    return b.finalize(root)
