"""The `use Xema` module / xema_struct declarative API, mirroring
test/xema/use_test.exs and use_nested_test.exs semantics."""

import pytest

from xema_ray.functions.cast import CastError
from xema_ray.functions.errors import ValidationError
from xema_ray.functions.scalar import Atom
from xema_ray.schema.declarative import SchemaModule, Struct, field, xema
from xema_ray.schema.dsl import integer, list_, map_, string


def test_multi_false_with_two_schemas_raises():
    # use_test.exs: "Use `use Xema, multi: true` to setup multiple schema..."
    with pytest.raises(RuntimeError, match="multi: true"):
        class MultiError(SchemaModule):
            int_ = xema("integer")
            str_ = xema("string")


A = Atom  # the reference's schemas/data are atom-keyed (use_test.exs)


class UserSchema(SchemaModule):
    user = xema(map_(properties={
        A("name"): string(min_length=1),
        A("age"): integer(minimum=0),
    }))


def test_single_schema_module_valid():
    assert UserSchema.valid("user", {A("name"): "Nick", A("age"): 24})
    assert UserSchema.valid({A("name"): "Nick", A("age"): 24})  # default dispatch
    assert not UserSchema.valid({A("name"): "", A("age"): 24})


def test_single_schema_module_cast():
    out, viols = UserSchema.cast({A("name"): "Nick", A("age"): "42"})
    assert out == {A("name"): "Nick", A("age"): 42} and not viols
    assert UserSchema.cast_bang({A("name"): "Nick", A("age"): "42"})[A("age")] == 42
    # CastError for inconvertible data (use_test: name [] → :string)
    with pytest.raises(CastError):
        UserSchema.cast({A("name"): [], A("age"): "42"})
    # ValidationError (reference message) when cast converts but fails
    with pytest.raises(ValidationError) as ei:
        UserSchema.cast_bang({A("name"): "Nick", A("age"): "-42"})
    assert str(ei.value) == \
        "Value -42 is less than minimum value of 0, at [:age]."


class Schemas(SchemaModule, multi=True, default="person"):
    person = xema(map_(properties={
        A("name"): string(min_length=1),
        A("age"): integer(minimum=0),
    }))
    nums = xema(map_(properties={
        A("pos"): list_(items=integer(minimum=0)),
        A("neg"): list_(items=integer(maximum=0)),
    }))


def test_multi_schema_dispatch():
    assert Schemas.valid("person", {A("name"): "John", A("age"): 21})
    assert not Schemas.valid("person", {A("name"): "John", A("age"): -21})
    assert Schemas.valid({A("name"): "John", A("age"): 21})  # default=person
    assert Schemas.valid("nums", {A("pos"): [1, 2, 3], A("neg"): [-5, -4]})
    assert not Schemas.valid("nums", {A("pos"): [1, -2, 3], A("neg"): [-5, -4]})
    with pytest.raises(KeyError):
        Schemas.valid("nope", {})


def test_multi_schema_validate_bang_messages():
    assert Schemas.validate("person", {A("name"): "John", A("age"): 21}) == []
    with pytest.raises(ValidationError) as ei:
        Schemas.validate_bang({A("name"): "John", A("age"): -21})
    assert str(ei.value) == \
        "Value -21 is less than minimum value of 0, at [:age]."
    with pytest.raises(ValidationError) as ei:
        Schemas.validate_bang("nums", {A("pos"): [1, -2, 3], A("neg"): [-5, -4]})
    assert str(ei.value) == \
        "Value -2 is less than minimum value of 0, at [:pos, 1]."


_UUID = "da6dc006-f8de-465d-bc6b-97ba4727f183"


class Grant(Struct):
    op = field("atom", enum=[Atom("foo"), Atom("bar"), Atom("baz")],
               required=True)
    permissions = field("list", items=("atom", {
        "enum": [Atom("create"), Atom("read"), Atom("update"), Atom("delete")]
    }), required=True)


class User(Struct):
    id = field("string", default=lambda: _UUID,
               pattern=r"^[a-z0-9]{8}\-[a-z0-9]{4}\-[a-z0-9]{4}\-[a-z0-9]{4}\-[a-z0-9]{12}$")
    name = field("string", min_length=1, required=True)
    age = field(["integer", "nil"], minimum=0)


def test_struct_cast_builds_instance_with_defaults():
    u = User.cast({A("name"): "Nick", A("age"): "42"})
    assert isinstance(u, User)
    assert u.name == "Nick" and u.age == 42 and u.id == _UUID


def test_struct_instance_validates():
    u = User.cast({"name": "Nick"})
    assert User.valid(u)
    u.name = ""
    assert not User.valid(u)


def test_struct_required_and_enum():
    g = Grant.cast({"op": Atom("foo"), "permissions": [Atom("read")]})
    assert g.op == Atom("foo")
    with pytest.raises(ValidationError):
        Grant.cast({"op": Atom("nope"), "permissions": []})
    with pytest.raises((ValidationError, CastError)):
        Grant.cast({"permissions": [Atom("read")]})  # op missing


def test_struct_cast_error_message_is_reference_exact():
    with pytest.raises(ValidationError) as ei:
        User.cast({"name": "Nick", "age": -1})
    assert "is less than minimum value of 0" in str(ei.value)


def test_struct_default_does_not_override_string_keyed_value():
    """merge_defaults probes BOTH key kinds (xema.ex:1055-1060) — a
    string-keyed "age" must block the atom-keyed default."""
    u = User.cast({"name": "Nick", "age": "42"})
    assert u.age == 42


def test_schema_module_inheritance():
    """code-review r2: subclassing must inherit declarations."""
    class Base(SchemaModule):
        s = xema("integer")

    class Child(Base):
        pass

    assert Child.valid(5) and not Child.valid("x")

    class GrandChild(Child, multi=True):
        t = xema("string")

    assert GrandChild.valid("s", 5) and GrandChild.valid("t", "hi")


def test_struct_inheritance():
    class BaseS(Struct):
        a = field("integer", required=True)

    class ChildS(BaseS):
        b = field("string", default="x")

    c = ChildS.cast({"a": "5"})
    assert c.a == 5 and c.b == "x"
