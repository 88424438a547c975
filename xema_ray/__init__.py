"""xema_ray — a Ray-Data-native schema + constraint validation engine.

A brand-new engine with the query/validation capabilities of the reference
Elixir library Xema (egze/xema, JSON-Schema drafts 4/6/7 style validation),
re-expressed Ray-Data-first: schemas compile to ASTs that are evaluated as
vectorized Arrow compute predicates inside ``Dataset.map_batches`` actor
pools, with table-level checks (column stats, uniqueness, referential
integrity, distribution drift) built on streaming groupby-aggregate and
explicitly partitioned shuffles.

Quick start (doctests, executed by ``tests/test_doctests.py`` — the
executed-examples layer mirroring the reference's module doctests,
``xema.ex:39-133``):

>>> import xema_ray as xr
>>> schema = xr.compile_schema("string")
>>> xr.is_valid(schema, "hello")
True
>>> xr.is_valid(schema, 42)
False

Keyword constraints and reference-exact error reporting:

>>> bounded = xr.compile_schema(("integer", {"minimum": 2}))
>>> [v.keyword for v in xr.validate_value(bounded, 1)]
['minimum']
>>> xr.validation_message(bounded, 1)
'Value 1 is less than minimum value of 2.'
>>> xr.validation_reason(bounded, 1)
{'minimum': 2, 'value': 1}

Map schemas with required properties:

>>> person = xr.compile_schema(("map", {
...     "properties": {"name": "string",
...                    "age": ("integer", {"minimum": 0})},
...     "required": ["name"]}))
>>> xr.is_valid(person, {"name": "Ada", "age": 36})
True
>>> xr.validation_message(person, {"age": -1})
'Required properties are missing: ["name"].'

Casting (the reference's ``Xema.cast``):

>>> xr.cast_value(xr.compile_schema("integer"), "42")
42

Layout:
  schema/     schema AST, Python DSL builder, JSON-Schema loader, meta-validation
  functions/  pure compute: scalar validator (semantics ground truth),
              vectorized Arrow kernels, sketches (HLL/histogram/MinHash),
              text analysis, cast/coercion
  stages/     map_batches stage classes (validator actor pool, cast stage,
              stats partials, dedup, similarity, multimodal)
  sources/    data readers + the deterministic synthetic corpus generator
  state/      checkpoint manifests, broadcast helpers
  pipelines/  end-to-end pipelines (flagship corpus validation, dedup, ...)
"""

# Import-time allocator tuning: every Ray worker that unpickles a stage
# imports this package, so raising glibc's mmap/trim thresholds here
# reaches all task/actor processes without touching ray.init (which the
# driver owns).  Concurrent first-touch faulting of large numpy
# temporaries otherwise serializes many-core single-image hosts (see
# stages/shuffle.tune_malloc for measurements).
from xema_ray.stages.shuffle import tune_malloc as _tune_malloc

_tune_malloc()

from xema_ray.schema.builder import SchemaError, compile_schema
from xema_ray.schema.json_schema import from_json_schema, validate_json_schema
from xema_ray.schema.source import schema_source
from xema_ray.functions.scalar import Atom, Violation, validate_value, is_valid
from xema_ray.functions.cast import CastError, cast, cast_value
from xema_ray.functions.errors import ValidationError, format_violations, validate_or_raise
from xema_ray.functions.messages import elixir_inspect, format_error, validation_message, validation_reason
from xema_ray.stages.validate import validate_dataset, ValidationResult
from xema_ray.schema.declarative import SchemaModule, Struct, field, xema

__version__ = "0.1.0"

__all__ = [
    "compile_schema",
    "from_json_schema",
    "validate_json_schema",
    "schema_source",
    "Atom",
    "SchemaError",
    "validate_value",
    "is_valid",
    "Violation",
    "cast",
    "cast_value",
    "CastError",
    "ValidationError",
    "format_violations",
    "validate_or_raise",
    "validation_message",
    "validation_reason",
    "format_error",
    "elixir_inspect",
    "validate_dataset",
    "SchemaModule",
    "Struct",
    "field",
    "xema",
    "ValidationResult",
]
