"""JSON-Schema (drafts 4/6/7) loader → :class:`CompiledSchema`.

The analogue of ``Xema.from_json_schema`` (reference lib/xema.ex:290-293 and
lib/xema/json_schema.ex:81-219): camelCase keywords map to snake slots,
``object``→``map`` / ``array``→``list`` / ``null``→``nil`` type mapping, and
draft-4's boolean ``exclusiveMinimum/Maximum`` form is preserved on the AST
(the validator implements both the boolean draft-4 and numeric draft-6 forms,
reference validator.ex:483-530).

Keyword/type mapping itself lives in :mod:`xema_ray.schema.builder`
(`KEYWORD_ALIASES`, `_norm_type`); this module adds draft handling and light
meta-validation of the JSON-Schema source (json_schema/validator.ex analogue).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from xema_ray.schema.ast import CompiledSchema
from xema_ray.schema.builder import SchemaError, compile_schema

DRAFTS = ("draft4", "draft6", "draft7")

_DRAFT_URIS = {
    "http://json-schema.org/draft-04/schema": "draft4",
    "http://json-schema.org/draft-06/schema": "draft6",
    "http://json-schema.org/draft-07/schema": "draft7",
}


def detect_draft(source: Any, default: str = "draft7") -> str:
    """Pick the draft from ``$schema`` (reference json_schema.ex:119-124)."""
    if isinstance(source, dict):
        uri = source.get("$schema")
        if isinstance(uri, str):
            key = uri.rstrip("#")
            if key in _DRAFT_URIS:
                return _DRAFT_URIS[key]
    return default


def _meta_check(source: Any, draft: str, path: str = "#") -> None:
    """Light structural validation of JSON-Schema input (the stand-in for
    validating against the official draft metaschema,
    reference json_schema/validator.ex:9-343)."""
    if isinstance(source, bool):
        if draft == "draft4":
            raise SchemaError(f"{path}: boolean schemas are draft-6+")
        return
    if not isinstance(source, dict):
        raise SchemaError(f"{path}: JSON Schema must be an object or boolean, got {type(source).__name__}")
    t = source.get("type")
    if t is not None:
        names = t if isinstance(t, list) else [t]
        allowed = {"object", "array", "string", "number", "integer", "boolean", "null"}
        for n in names:
            if n not in allowed:
                raise SchemaError(f"{path}/type: unknown JSON-Schema type {n!r}")
    for kw in ("properties", "patternProperties", "definitions", "$defs"):
        sub = source.get(kw)
        if sub is not None:
            if not isinstance(sub, dict):
                raise SchemaError(f"{path}/{kw}: must be an object")
            for k, v in sub.items():
                _meta_check(v, draft, f"{path}/{kw}/{k}")
    for kw in ("allOf", "anyOf", "oneOf"):
        sub = source.get(kw)
        if sub is not None:
            if not isinstance(sub, list) or not sub:
                raise SchemaError(f"{path}/{kw}: must be a non-empty array")
            for i, v in enumerate(sub):
                _meta_check(v, draft, f"{path}/{kw}/{i}")
    for kw in ("not", "if", "then", "else", "contains", "propertyNames", "additionalProperties", "additionalItems"):
        sub = source.get(kw)
        if sub is not None and not isinstance(sub, bool):
            _meta_check(sub, draft, f"{path}/{kw}")
    items = source.get("items")
    if items is not None:
        if isinstance(items, list):
            for i, v in enumerate(items):
                _meta_check(v, draft, f"{path}/items/{i}")
        elif not isinstance(items, bool):
            _meta_check(items, draft, f"{path}/items")


def from_json_schema(
    source: Any,
    draft: Optional[str] = None,
    loader: Optional[Callable] = None,
    validate: bool = True,
) -> CompiledSchema:
    """Compile a JSON-Schema document (dict or bool) to a CompiledSchema."""
    draft = draft or detect_draft(source)
    if draft not in DRAFTS:
        raise SchemaError(f"unsupported draft: {draft!r} (supported: {DRAFTS})")
    if validate:
        _meta_check(source, draft)
    return compile_schema(source, loader=loader)


_META_CACHE: dict = {}


def validate_json_schema(meta_uri: str, source: Any):
    """Validate a JSON-Schema document against a bundled draft metaschema —
    the ``Xema.JsonSchema.Validator.validate/2`` analogue
    (reference test/xema/json_schema/validator_test.exs): returns ``None``
    when the document conforms, else the reference-shaped reason (e.g.
    ``{"properties": {"minimum": {"type": :number, "value": "5"}}}``)."""
    from xema_ray.functions.messages import validation_reason
    from xema_ray.schema.metaschemas import metaschema_loader

    key = meta_uri.rstrip("#")
    meta = _META_CACHE.get(key)
    if meta is None:
        try:
            doc = metaschema_loader(meta_uri)
        except KeyError:
            raise SchemaError(
                f"unknown metaschema URI {meta_uri!r} "
                f"(bundled: {sorted(_DRAFT_URIS)})") from None
        meta = _META_CACHE[key] = compile_schema(doc)
    return validation_reason(meta, source)
