"""Schema → DSL source reconstruction (the ``Xema.source/1`` analogue,
reference lib/xema.ex:536-560): turn a compiled :class:`SchemaNode` tree
back into the tuple/dict DSL that :func:`compile_schema` accepts, so
schemas round-trip ``compile → source → compile`` with identical
validation behavior."""

from __future__ import annotations

from typing import Any

from xema_ray.schema.ast import UNSET, CompiledSchema, SchemaNode

_SUB = ("not_", "if_", "then", "else_", "contains", "property_names")
_SUB_LIST = ("all_of", "any_of", "one_of")
_SUB_MAP = ("properties", "pattern_properties", "definitions")
_SCALARS = (
    "enum", "minimum", "maximum", "exclusive_minimum",
    "exclusive_maximum", "multiple_of", "min_length", "max_length", "pattern",
    "format", "min_items", "max_items", "unique_items", "min_properties",
    "max_properties", "ref", "id", "schema", "title", "description", "comment",
    "examples", "keys", "module", "content_encoding",
    "content_media_type",
)
_UNSET_SENTINEL = ("const", "default")  # None is a meaningful value here
_RENAME = {"not_": "not", "if_": "if", "else_": "else"}


def schema_source(schema) -> Any:
    """DSL source for a compiled schema/node."""
    node = schema.root if isinstance(schema, CompiledSchema) else schema
    return _source(node)


def _source(node: SchemaNode) -> Any:
    if node.bool_schema is not None:
        return node.bool_schema
    kw: dict = {}
    for slot in _SCALARS:
        v = getattr(node, slot)
        if v is None or v is UNSET:
            continue
        kw[_RENAME.get(slot, slot)] = v
    for slot in _UNSET_SENTINEL:
        v = getattr(node, slot)
        if v is not UNSET:
            kw[slot] = v
    for slot in _SUB:
        v = getattr(node, slot)
        if v is not None:
            kw[_RENAME.get(slot, slot)] = _source(v)
    for slot in _SUB_LIST:
        v = getattr(node, slot)
        if v:
            kw[slot] = [_source(s) for s in v]
    for slot in _SUB_MAP:
        v = getattr(node, slot)
        if v:
            kw[slot] = {k: _source(s) for k, s in v.items()}
    if node.items is not None:
        if isinstance(node.items, list):
            # positional: bare type names would read back as a union-type
            # schema — emit unambiguous (type, {}) tuples instead
            kw["items"] = [
                (s2, {}) if isinstance(s2 := _source(s), str) else s2
                for s in node.items
            ]
        else:
            kw["items"] = _source(node.items)
    for slot in ("additional_items", "additional_properties"):
        v = getattr(node, slot)
        if v is not None:
            kw[slot] = _source(v) if isinstance(v, SchemaNode) else v
    if node.required is not None:
        kw["required"] = sorted(node.required)
    if node.dependencies:
        kw["dependencies"] = {
            k: (_source(d) if isinstance(d, SchemaNode) else list(d))
            for k, d in node.dependencies.items()
        }
    if node.data:
        kw.update(node.data)
    if node.validator is not None:
        kw["validator"] = node.validator
    if node.caster is not None:
        kw["caster"] = node.caster

    types = node.types
    if types is None:
        return kw if kw else "any"
    if not kw:
        return types[0] if len(types) == 1 else list(types)
    type_part = types[0] if len(types) == 1 else list(types)
    return (type_part, kw)
