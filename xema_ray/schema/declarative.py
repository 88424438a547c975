"""Declarative module/struct schema API — the analogue of the reference's
``use Xema`` + ``xema``/``xema_struct``/``field`` macros
(lib/xema/builder.ex:199-323, pinned by test/xema/use_test.exs and
use_nested_test.exs).

Two class-based forms:

* :class:`SchemaModule` — a module holding one or more NAMED schemas with
  ``valid``/``validate``/``validate_bang``/``cast``/``cast_bang``
  classmethods; ``multi=True`` enables several schemas per module,
  ``default=`` names the schema used when no name is passed
  (doctests, executed by ``tests/test_doctests.py``):

    >>> from xema_ray import SchemaModule, xema
    >>> class Schemas(SchemaModule, multi=True, default="person"):
    ...     person = xema(("map", {"properties":
    ...         {"name": ("string", {"min_length": 1})}}))
    ...     num = xema(("integer", {"minimum": 0}))
    >>> Schemas.valid({"name": "John"})   # default schema
    True
    >>> Schemas.valid("num", -5)
    False

* :class:`Struct` — a struct class whose fields carry schemas and
  defaults; ``cast`` converts a map/keyword list INTO an instance
  (``struct!`` analogue), and instances validate as struct-typed values.

    >>> from xema_ray import Struct, field
    >>> class User(Struct):
    ...     name = field("string", min_length=1, required=True)
    ...     age = field(["integer", "nil"], minimum=0)
    >>> User.cast({"name": "Ada", "age": 36})
    User(name='Ada', age=36)
    >>> User.valid({"name": "", "age": 1})
    False

``validate_bang`` raises :class:`xema_ray.functions.errors.ValidationError`
whose message is the reference-exact rendering
(:func:`xema_ray.functions.messages.validation_message`).
"""

from __future__ import annotations

from typing import Any, Optional

from xema_ray.functions.cast import cast_value
from xema_ray.functions.errors import ValidationError
from xema_ray.functions.messages import validation_message
from xema_ray.functions.scalar import validate_value
from xema_ray.schema.ast import UNSET
from xema_ray.schema.builder import compile_schema

_MULTI_MSG = "Use `use Xema, multi: true` to setup multiple schema in a module."


class _XemaDecl:
    __slots__ = ("source",)

    def __init__(self, source: Any):
        self.source = source


def xema(source: Any) -> _XemaDecl:
    """Declare a named schema inside a :class:`SchemaModule` body."""
    return _XemaDecl(source)


class SchemaModule:
    """Subclass with ``xema(...)`` class attributes (the ``use Xema``
    module analogue)."""

    __xemas__: dict = {}
    __default__: Optional[str] = None

    def __init_subclass__(cls, multi: bool = False, default: Optional[str] = None,
                          **kw):
        super().__init_subclass__(**kw)
        decls = {name: v for name, v in vars(cls).items()
                 if isinstance(v, _XemaDecl)}
        inherited = dict(getattr(cls, "__xemas__", {}))
        if not multi and len(decls) > 1:
            raise RuntimeError(_MULTI_MSG)
        compiled = dict(inherited)
        compiled.update({name: compile_schema(d.source)
                         for name, d in decls.items()})
        if default is not None and default not in compiled:
            raise ValueError(f"default schema {default!r} is not declared")
        cls.__xemas__ = compiled
        if default is not None:
            cls.__default__ = default
        elif decls and len(compiled) == 1:
            cls.__default__ = next(iter(compiled))
        elif not decls:
            cls.__default__ = getattr(cls, "__default__", None)  # inherit
        else:
            cls.__default__ = None

    # -- name resolution ------------------------------------------------

    @classmethod
    def _resolve(cls, name_or_value, value):
        if value is UNSET:
            name = cls.__default__
            if name is None:
                detail = ("declares no schemas" if not cls.__xemas__
                          else "has multiple schemas and no default — "
                               "pass the schema name")
                raise ValueError(f"{cls.__name__} {detail}")
            return cls.__xemas__[name], name_or_value
        if name_or_value not in cls.__xemas__:
            raise KeyError(f"no schema named {name_or_value!r} in {cls.__name__}")
        return cls.__xemas__[name_or_value], value

    # -- the reference's generated function surface ---------------------

    @classmethod
    def valid(cls, name_or_value, value: Any = UNSET) -> bool:
        schema, v = cls._resolve(name_or_value, value)
        return not validate_value(schema, v)

    @classmethod
    def validate(cls, name_or_value, value: Any = UNSET) -> list:
        """Violation list ([] when valid) — `validate/1,2`."""
        schema, v = cls._resolve(name_or_value, value)
        return validate_value(schema, v)

    @classmethod
    def validate_bang(cls, name_or_value, value: Any = UNSET):
        """`validate!`: return the value or raise ValidationError with the
        reference-exact message."""
        schema, v = cls._resolve(name_or_value, value)
        viols = validate_value(schema, v)
        if viols:
            err = ValidationError(viols)
            msg = validation_message(schema, v)
            if msg is not None:
                err.args = (msg,)
            raise err
        return v

    @classmethod
    def cast(cls, name_or_value, value: Any = UNSET):
        """`cast/1,2`: ``(converted, violations)``; raises CastError on
        inconvertible input."""
        schema, v = cls._resolve(name_or_value, value)
        out = cast_value(schema, v)
        return out, validate_value(schema, out)

    @classmethod
    def cast_bang(cls, name_or_value, value: Any = UNSET):
        """`cast!`: converted value, or CastError / ValidationError."""
        schema, v = cls._resolve(name_or_value, value)
        out = cast_value(schema, v)
        viols = validate_value(schema, out)
        if viols:
            err = ValidationError(viols)
            msg = validation_message(schema, out)
            if msg is not None:
                err.args = (msg,)
            raise err
        return out


# ----------------------------------------------------------------------
# xema_struct / field
# ----------------------------------------------------------------------


class _FieldDecl:
    __slots__ = ("source", "default", "required")

    def __init__(self, source, default, required):
        self.source = source
        self.default = default
        self.required = required


def field(type_or_source: Any = "any", *, default: Any = UNSET,
          required: bool = False, **keywords) -> _FieldDecl:
    """Declare a struct field (`field/3` macro analogue): a type name /
    DSL source plus keyword constraints, an optional default (value or
    zero-arg callable), and a required flag."""
    if keywords:
        if isinstance(type_or_source, str):
            src: Any = (type_or_source, keywords)
        elif isinstance(type_or_source, list):
            src = (type_or_source, keywords)
        elif isinstance(type_or_source, tuple) and len(type_or_source) == 2 \
                and isinstance(type_or_source[1], dict):
            src = (type_or_source[0], {**type_or_source[1], **keywords})
        else:
            raise ValueError(f"cannot merge keywords into {type_or_source!r}")
    else:
        src = type_or_source
    if default is not UNSET:
        if isinstance(src, str):
            src = (src, {"default": default})
        elif isinstance(src, tuple) and len(src) == 2 and isinstance(src[1], dict):
            src = (src[0], {**src[1], "default": default})
        elif isinstance(src, list):
            src = (src, {"default": default})
    return _FieldDecl(src, default, required)


class Struct:
    """``xema_struct`` analogue: fields become schema properties; ``cast``
    builds instances; instances validate as struct-typed values."""

    __fields__: dict = {}
    __xema__ = None

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        fields = dict(getattr(cls, "__fields__", {}))  # inherit parent fields
        fields.update({name: f for name, f in vars(cls).items()
                       if isinstance(f, _FieldDecl)})
        required = [n for n, f in fields.items() if f.required]
        extra = getattr(cls, "__required__", None)
        if extra:
            required = sorted(set(required) | set(extra))
        from xema_ray.functions.scalar import Atom

        # struct fields are ATOMS in the reference (defstruct keys); the
        # atom-keyed schema + key_to conversion lets string-keyed input
        # maps cast into the struct
        src = ("struct", {
            "module": cls.__name__,
            "properties": {Atom(n): f.source for n, f in fields.items()},
            **({"required": [Atom(r) for r in required]} if required else {}),
        })
        cls.__fields__ = fields
        cls.__xema__ = compile_schema(src)
        for name in fields:  # field declarations are not instance values
            delattr_safe(cls, name)

    def __init__(self, **values):
        for name, f in self.__fields__.items():
            if name in values:
                setattr(self, name, values.pop(name))
            elif f.default is not UNSET:
                d = f.default
                setattr(self, name, d() if callable(d) else d)
            else:
                setattr(self, name, None)
        if values:
            raise TypeError(f"unknown field(s) {sorted(values)} for "
                            f"{type(self).__name__}")

    def __repr__(self):
        body = ", ".join(f"{n}={getattr(self, n)!r}" for n in self.__fields__)
        return f"{type(self).__name__}({body})"

    def __eq__(self, other):
        return type(other) is type(self) and all(
            getattr(self, n) == getattr(other, n) for n in self.__fields__)

    def to_map(self) -> dict:
        """The tagged-dict term the engine validates (`Map.from_struct` +
        __struct__ tag; field keys are atoms)."""
        from xema_ray.functions.scalar import Atom

        out: dict = {"__struct__": type(self).__name__}
        for n in self.__fields__:
            out[Atom(n)] = getattr(self, n)
        return out

    @classmethod
    def _term(cls, data):
        if isinstance(data, cls):
            return data.to_map()
        return data

    @classmethod
    def valid(cls, data) -> bool:
        return not validate_value(cls.__xema__, cls._term(data))

    @classmethod
    def validate(cls, data) -> list:
        return validate_value(cls.__xema__, cls._term(data))

    @classmethod
    def cast(cls, data) -> "Struct":
        """Convert a map / keyword list into a validated instance
        (`Module.cast/1` via struct!)."""
        out = cast_value(cls.__xema__, cls._term(data))
        viols = validate_value(cls.__xema__, out)
        if viols:
            err = ValidationError(viols)
            msg = validation_message(cls.__xema__, out)
            if msg is not None:
                err.args = (msg,)
            raise err
        values = {k: v for k, v in out.items() if k != "__struct__"}
        return cls(**{str(k): v for k, v in values.items()})


def delattr_safe(cls, name):
    try:
        delattr(cls, name)
    except AttributeError:
        pass
