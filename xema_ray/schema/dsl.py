"""Builder-function DSL — ergonomic schema construction.

The analogue of the reference's ``Xema.Builder`` functions/macros
(lib/xema/builder.ex:21-323: one builder per type, ``xema_struct`` /
``field`` / ``required``): each helper returns a DSL source tuple that
``compile_schema`` accepts anywhere a sub-schema is expected.

    from xema_ray.schema.dsl import map_, list_, integer, string, schema

    s = schema(map_(
        properties={
            "doc_id": string(pattern=r"^[a-z-]+\\d{12}$"),
            "tokens": list_(items=integer(minimum=0), min_items=1),
        },
        required=["doc_id", "tokens"],
    ))
"""

from __future__ import annotations

from typing import Any

from xema_ray.schema.ast import CompiledSchema
from xema_ray.schema.builder import compile_schema


def _typed(type_name: str):
    def builder(**keywords) -> tuple:
        return (type_name, keywords) if keywords else type_name

    builder.__name__ = type_name
    builder.__doc__ = f"Schema source for type ``{type_name}`` with keyword arguments."
    return builder


any_ = _typed("any")
atom = _typed("atom")
boolean = _typed("boolean")
string = _typed("string")
number = _typed("number")
integer = _typed("integer")
float_ = _typed("float")
list_ = _typed("list")
tuple_ = _typed("tuple")
map_ = _typed("map")
keyword = _typed("keyword")
nil = _typed("nil")


def struct(module: str = None, **keywords) -> tuple:
    if module is not None:
        keywords["module"] = module
    return ("struct", keywords)


def one_of(*branches, **keywords) -> dict:
    return {"one_of": list(branches), **keywords}


def any_of(*branches, **keywords) -> dict:
    return {"any_of": list(branches), **keywords}


def all_of(*branches, **keywords) -> dict:
    return {"all_of": list(branches), **keywords}


def not_(branch, **keywords) -> dict:
    return {"not": branch, **keywords}


def ref(pointer: str) -> dict:
    return {"ref": pointer}


def schema(source: Any, **kwargs) -> CompiledSchema:
    """Compile a DSL source (alias of :func:`compile_schema`)."""
    return compile_schema(source, **kwargs)
