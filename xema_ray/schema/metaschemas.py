"""Bundled JSON-Schema draft metaschemas (public documents from
json-schema.org), served by the default ref loader so
``{"$ref": "http://json-schema.org/draft-07/schema#"}`` resolves without
network — the analogue of the reference bundling the official drafts for
its own meta-validation (lib/xema/json_schema/validator.ex)."""

from __future__ import annotations

_COMMON_DEFS = {
    "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
    "nonNegativeInteger": {"type": "integer", "minimum": 0},
    "nonNegativeIntegerDefault0": {
        "allOf": [{"$ref": "#/definitions/nonNegativeInteger"}, {"default": 0}]
    },
    "simpleTypes": {
        "enum": ["array", "boolean", "integer", "null", "number", "object", "string"]
    },
    "stringArray": {
        "type": "array", "items": {"type": "string"}, "uniqueItems": True,
        "default": [],
    },
}

_COMMON_PROPS = {
    "title": {"type": "string"},
    "description": {"type": "string"},
    "default": True,
    "multipleOf": {"type": "number", "exclusiveMinimum": 0},
    "maximum": {"type": "number"},
    "minimum": {"type": "number"},
    "maxLength": {"$ref": "#/definitions/nonNegativeInteger"},
    "minLength": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
    "pattern": {"type": "string", "format": "regex"},
    "maxItems": {"$ref": "#/definitions/nonNegativeInteger"},
    "minItems": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
    "uniqueItems": {"type": "boolean", "default": False},
    "maxProperties": {"$ref": "#/definitions/nonNegativeInteger"},
    "minProperties": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
    "required": {"$ref": "#/definitions/stringArray"},
    "additionalItems": {"$ref": "#"},
    "items": {
        "anyOf": [{"$ref": "#"}, {"$ref": "#/definitions/schemaArray"}],
        "default": True,
    },
    "additionalProperties": {"$ref": "#"},
    "definitions": {"type": "object", "additionalProperties": {"$ref": "#"},
                    "default": {}},
    "properties": {"type": "object", "additionalProperties": {"$ref": "#"},
                   "default": {}},
    "patternProperties": {"type": "object", "additionalProperties": {"$ref": "#"},
                          "default": {}},
    "dependencies": {
        "type": "object",
        "additionalProperties": {
            "anyOf": [{"$ref": "#"}, {"$ref": "#/definitions/stringArray"}]
        },
    },
    "enum": {"type": "array", "items": True},
    "type": {
        "anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array", "items": {"$ref": "#/definitions/simpleTypes"},
             "minItems": 1, "uniqueItems": True},
        ]
    },
    "format": {"type": "string"},
    "allOf": {"$ref": "#/definitions/schemaArray"},
    "anyOf": {"$ref": "#/definitions/schemaArray"},
    "oneOf": {"$ref": "#/definitions/schemaArray"},
    "not": {"$ref": "#"},
}

DRAFT7 = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "http://json-schema.org/draft-07/schema#",
    "title": "Core schema meta-schema",
    "definitions": _COMMON_DEFS,
    "type": ["object", "boolean"],
    "properties": {
        **_COMMON_PROPS,
        "$id": {"type": "string", "format": "uri-reference"},
        "$schema": {"type": "string", "format": "uri"},
        "$ref": {"type": "string", "format": "uri-reference"},
        "$comment": {"type": "string"},
        "readOnly": {"type": "boolean", "default": False},
        "examples": {"type": "array", "items": True},
        "exclusiveMaximum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "contains": {"$ref": "#"},
        "propertyNames": {"$ref": "#"},
        "const": True,
        "contentMediaType": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "if": {"$ref": "#"},
        "then": {"$ref": "#"},
        "else": {"$ref": "#"},
    },
    "default": True,
}

DRAFT6 = {
    "$schema": "http://json-schema.org/draft-06/schema#",
    "$id": "http://json-schema.org/draft-06/schema#",
    "title": "Core schema meta-schema",
    "definitions": _COMMON_DEFS,
    "type": ["object", "boolean"],
    "properties": {
        **_COMMON_PROPS,
        "$id": {"type": "string", "format": "uri-reference"},
        "$schema": {"type": "string", "format": "uri"},
        "$ref": {"type": "string", "format": "uri-reference"},
        "examples": {"type": "array", "items": True},
        "exclusiveMaximum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "contains": {"$ref": "#"},
        "propertyNames": {"$ref": "#"},
        "const": True,
    },
    "default": True,
}

DRAFT4 = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "id": "http://json-schema.org/draft-04/schema#",
    "description": "Core schema meta-schema",
    "definitions": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
        "positiveInteger": {"type": "integer", "minimum": 0},
        "positiveIntegerDefault0": {
            "allOf": [{"$ref": "#/definitions/positiveInteger"}, {"default": 0}]
        },
        "simpleTypes": {
            "enum": ["array", "boolean", "integer", "null", "number", "object",
                     "string"]
        },
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "minItems": 1, "uniqueItems": True},
    },
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "$schema": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": {},
        "multipleOf": {"type": "number", "minimum": 0, "exclusiveMinimum": True},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "boolean", "default": False},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "boolean", "default": False},
        "maxLength": {"$ref": "#/definitions/positiveInteger"},
        "minLength": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "pattern": {"type": "string", "format": "regex"},
        "additionalItems": {"anyOf": [{"type": "boolean"}, {"$ref": "#"}],
                            "default": {}},
        "items": {"anyOf": [{"$ref": "#"}, {"$ref": "#/definitions/schemaArray"}],
                  "default": {}},
        "maxItems": {"$ref": "#/definitions/positiveInteger"},
        "minItems": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "uniqueItems": {"type": "boolean", "default": False},
        "maxProperties": {"$ref": "#/definitions/positiveInteger"},
        "minProperties": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "required": {"$ref": "#/definitions/stringArray"},
        "additionalProperties": {"anyOf": [{"type": "boolean"}, {"$ref": "#"}],
                                 "default": {}},
        "definitions": {"type": "object", "additionalProperties": {"$ref": "#"},
                        "default": {}},
        "properties": {"type": "object", "additionalProperties": {"$ref": "#"},
                       "default": {}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "default": {}},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"$ref": "#"}, {"$ref": "#/definitions/stringArray"}]
            },
        },
        "enum": {"type": "array"},
        "type": {
            "anyOf": [
                {"$ref": "#/definitions/simpleTypes"},
                {"type": "array", "items": {"$ref": "#/definitions/simpleTypes"},
                 "minItems": 1, "uniqueItems": True},
            ]
        },
        "format": {"type": "string"},
        "allOf": {"$ref": "#/definitions/schemaArray"},
        "anyOf": {"$ref": "#/definitions/schemaArray"},
        "oneOf": {"$ref": "#/definitions/schemaArray"},
        "not": {"$ref": "#"},
    },
    "dependencies": {"exclusiveMaximum": ["maximum"],
                     "exclusiveMinimum": ["minimum"]},
    "default": {},
}

BUNDLED = {
    "http://json-schema.org/draft-07/schema": DRAFT7,
    "http://json-schema.org/draft-06/schema": DRAFT6,
    "http://json-schema.org/draft-04/schema": DRAFT4,
}


def metaschema_loader(uri: str):
    """Default ref loader: serves the bundled draft metaschemas, refuses
    everything else (the ``Xema.NoLoader`` behavior for unknown URIs)."""
    key = uri.rstrip("#")
    if key in BUNDLED:
        return BUNDLED[key]
    raise KeyError(uri)
