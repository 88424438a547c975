"""Schema AST — the compiled, pickleable representation of a schema.

Mirrors the keyword vocabulary of the reference validator (Xema's
``%Xema.Schema{}`` struct, see reference lib/xema/schema.ex:126-176): one
dataclass slot per keyword, sub-schemas held as nested ``SchemaNode`` trees.
The AST is pure Python and pickleable so it ships once per validator actor
(the analogue of Xema's compile-once / validate-many design).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, fields
from typing import Any, Callable, Optional


class _Unset:
    """Sentinel distinguishing "keyword absent" from ``None`` values.

    The reference marks ``const: nil`` with a ``:__nil__`` atom
    (schema.ex:375-378); we use a dedicated sentinel instead.
    """

    _instance: Optional["_Unset"] = None

    def __new__(cls) -> "_Unset":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "UNSET"

    def __bool__(self) -> bool:
        return False

    def __reduce__(self):
        return (_Unset, ())


UNSET = _Unset()

#: Recognized type names (reference lib/xema/schema.ex:198-214).  ``atom`` /
#: ``keyword`` / ``struct`` are Elixir-isms kept for schema compatibility;
#: over Arrow data they behave as ``string`` / ``map`` / ``map``.
TYPE_NAMES = (
    "any",
    "atom",
    "boolean",
    "string",
    "number",
    "integer",
    "float",
    "list",
    "tuple",
    "map",
    "keyword",
    "struct",
    "nil",
)


@dataclass
class SchemaNode:
    """One schema node.  ``None``/``UNSET`` slots mean "keyword absent"."""

    # --- type ---------------------------------------------------------
    # None => :any.  Tuple => union of types, first match wins
    # (validator.ex:73-79, 262-268).
    types: Optional[tuple] = None
    # boolean schema: True accepts everything, False rejects everything
    # (validator.ex:69-71).  None => a normal keyword schema.
    bool_schema: Optional[bool] = None

    # --- generic keywords (apply to any type) -------------------------
    const: Any = UNSET
    enum: Optional[list] = None
    not_: Optional["SchemaNode"] = None
    all_of: Optional[list] = None
    any_of: Optional[list] = None
    one_of: Optional[list] = None
    if_: Optional["SchemaNode"] = None
    then: Optional["SchemaNode"] = None
    else_: Optional["SchemaNode"] = None
    ref: Optional[str] = None

    # --- numeric ------------------------------------------------------
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    # draft-4 boolean form or draft-6 numeric form (validator.ex:483-530)
    exclusive_minimum: Any = None
    exclusive_maximum: Any = None
    multiple_of: Optional[float] = None

    # --- string -------------------------------------------------------
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[str] = None
    format: Optional[str] = None

    # --- list / tuple -------------------------------------------------
    # items: a single SchemaNode (homogeneous) or a list of SchemaNodes
    # (positional, validator.ex:684-777)
    items: Any = None
    additional_items: Any = None  # SchemaNode | bool | None
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: Optional[bool] = None
    contains: Optional["SchemaNode"] = None

    # --- map / object -------------------------------------------------
    properties: Optional[dict] = None  # name -> SchemaNode
    required: Optional[frozenset] = None
    additional_properties: Any = None  # SchemaNode | bool | None
    pattern_properties: Optional[dict] = None  # pattern str -> SchemaNode
    property_names: Optional["SchemaNode"] = None
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None
    dependencies: Optional[dict] = None  # key -> list[str] | SchemaNode
    keys: Optional[str] = None  # Elixir-ism (:atoms/:strings); metadata only
    module: Optional[str] = None  # struct refinement; tag metadata

    # --- annotation / misc -------------------------------------------
    id: Optional[str] = None
    schema: Optional[str] = None
    title: Optional[str] = None
    description: Optional[str] = None
    comment: Optional[str] = None
    examples: Optional[list] = None
    default: Any = UNSET
    definitions: Optional[dict] = None  # name -> SchemaNode
    data: Optional[dict] = None  # non-keyword side-data (xema.ex:445-501)
    content_encoding: Optional[str] = None
    content_media_type: Optional[str] = None

    # --- hooks --------------------------------------------------------
    # custom validator: callable(value) -> None | str (error message), the
    # analogue of validator.ex:1019-1041.  Batch-level UDF hooks live on
    # the table plan, not here.
    validator: Optional[Callable] = None
    # custom caster: callable(value) -> value (xema.ex:779-797)
    caster: Optional[Callable] = None
    # `allow:` extra grafted type (xema.ex:426-443), normalized into types

    # compiled artifacts (derived, set by the builder) ------------------
    pattern_re: Optional[re.Pattern] = field(default=None, repr=False)
    pattern_props_re: Optional[list] = field(default=None, repr=False)

    def keywords_present(self) -> list:
        """Names of constraint keywords set on this node (for planning)."""
        out = []
        for f in fields(self):
            if f.name in ("types", "bool_schema", "pattern_re", "pattern_props_re"):
                continue
            v = getattr(self, f.name)
            if f.name in ("const", "default"):
                # UNSET-sentinel slots: an explicit None IS a constraint
                # (const: nil, reference schema.ex:375-378)
                if v is UNSET:
                    continue
            elif v is UNSET or v is None:
                continue
            if f.name in _ANNOTATION_ONLY:
                continue
            out.append(f.name)
        return out

    def is_trivial(self) -> bool:
        """True when the node accepts everything (no constraints)."""
        return (
            self.bool_schema is not False
            and self.types is None
            and not self.keywords_present()
        )


_ANNOTATION_ONLY = {
    "id",
    "schema",
    "title",
    "description",
    "comment",
    "examples",
    "default",
    "definitions",
    "data",
    "content_encoding",
    "content_media_type",
    "keys",
    "caster",
}


@dataclass
class CompiledSchema:
    """Top-level compiled schema: root node + pointer map for (circular) refs.

    The analogue of ``%Xema{schema: ..., refs: ...}`` (reference
    lib/xema/behaviour.ex:50-56).  Non-circular refs are inlined at compile
    time (behaviour.ex:160-223); ``refs`` holds every resolvable pointer so
    circular refs still dereference at validation time.
    """

    root: SchemaNode
    refs: dict = field(default_factory=dict)  # pointer -> SchemaNode

    def resolve(self, pointer: str) -> SchemaNode:
        if pointer in self.refs:
            return self.refs[pointer]
        if pointer in ("#", ""):
            return self.root
        raise KeyError(f"unresolvable ref: {pointer!r}")
