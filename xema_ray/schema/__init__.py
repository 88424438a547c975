from xema_ray.schema.ast import SchemaNode, CompiledSchema, UNSET
from xema_ray.schema.builder import compile_schema
from xema_ray.schema.json_schema import from_json_schema

__all__ = ["SchemaNode", "CompiledSchema", "UNSET", "compile_schema", "from_json_schema"]
