"""Vendored STAC-MLM Item schema + pointerful validation.

The reference validates the synthesized Item against the hosted MLM
extension schema through pystac/stac-validator (reference
``process_implementations/load_model.py:4,36`` and
``opd_ml_dev_utils/init_models.py:240`` — ``mlm_item.validate()``
fetches ``https://stac-extensions.github.io/mlm/v1.4.0/schema.json``).
This sandbox has no network, so the schema below is REBUILT from the
published STAC-MLM v1.4 specification text (stac-extensions/mlm —
field tables for Item properties, Model Input, Model Output, Model
Band, Processing Expression and the common data-type enum), not
copied from any repository. Two deliberate loosenings vs the hosted
schema, both stated:

- ``mlm:tasks`` entries are validated as non-empty strings, not the
  spec's closed task enum — the enum grows release-to-release and a
  stale vendored copy would reject valid newer items;
- ``mlm:framework`` is any string (the spec itself only RECOMMENDS
  names); which frameworks this ENGINE can execute is a separate
  check in ``load_stac_ml`` (SUPPORTED_FRAMEWORKS).

Validation uses ``jsonschema`` when importable (baked into this
environment) and raises ``ValueError`` carrying every violation with
its JSON pointer path, so a bad item reports all problems at once.
"""

from __future__ import annotations

# the spec's common data-type enum (raster band data types)
_DATA_TYPES = [
    "uint8",
    "uint16",
    "uint32",
    "uint64",
    "int8",
    "int16",
    "int32",
    "int64",
    "float16",
    "float32",
    "float64",
    "cint16",
    "cint32",
    "cfloat32",
    "cfloat64",
    "other",
]

_PROCESSING_EXPRESSION = {
    "type": "object",
    "required": ["format", "expression"],
    "properties": {
        "format": {"type": "string", "minLength": 1},
        # expression is format-dependent: string for python/rio-calc,
        # object for process graphs — the spec allows any JSON value
    },
}

_MODEL_BAND = {
    "oneOf": [
        {"type": "string", "minLength": 1},
        {
            "type": "object",
            "required": ["name"],
            "properties": {
                "name": {"type": "string", "minLength": 1},
                "format": {"type": "string"},
                "expression": {},
            },
            # format and expression are both-or-neither (spec:
            # "must be defined together or not at all")
            "dependentRequired": {
                "format": ["expression"],
                "expression": ["format"],
            },
        },
    ]
}

_MODEL_STRUCTURE = {
    "type": "object",
    "required": ["shape", "dim_order", "data_type"],
    "properties": {
        "shape": {
            "type": "array",
            "minItems": 1,
            "items": {"type": "integer", "minimum": -1},
        },
        "dim_order": {
            "type": "array",
            "minItems": 1,
            "items": {"type": "string", "minLength": 1},
        },
        "data_type": {"enum": _DATA_TYPES},
    },
}

_VALUE_SCALING = {
    "type": "object",
    "required": ["type"],
    "properties": {
        "type": {"type": "string", "minLength": 1},
        "minimum": {"type": "number"},
        "maximum": {"type": "number"},
        "mean": {"type": "number"},
        "stddev": {"type": "number"},
        "value": {"type": "number"},
        "format": {"type": "string"},
        "expression": {},
    },
}

_MODEL_INPUT = {
    "type": "object",
    "required": ["name", "input"],
    "properties": {
        "name": {"type": "string", "minLength": 1},
        "bands": {"type": "array", "items": _MODEL_BAND},
        "input": _MODEL_STRUCTURE,
        "value_scaling": {
            "oneOf": [
                {"type": "null"},
                {"type": "array", "items": _VALUE_SCALING},
            ]
        },
        "resize_type": {"oneOf": [{"type": "null"}, {"type": "string"}]},
        "pre_processing_function": {
            "oneOf": [{"type": "null"}, _PROCESSING_EXPRESSION]
        },
    },
}

_MODEL_OUTPUT = {
    "type": "object",
    "required": ["name", "tasks", "result"],
    "properties": {
        "name": {"type": "string", "minLength": 1},
        "tasks": {
            "type": "array",
            "minItems": 1,
            "items": {"type": "string", "minLength": 1},
        },
        "result": _MODEL_STRUCTURE,
        "classification:classes": {"type": "array"},
        "post_processing_function": {
            "oneOf": [{"type": "null"}, _PROCESSING_EXPRESSION]
        },
    },
}

MLM_ITEM_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "title": "STAC-MLM Item (vendored subset, rebuilt from the v1.4 spec)",
    "type": "object",
    "required": ["type", "stac_version", "id", "properties"],
    "properties": {
        "type": {"const": "Feature"},
        "stac_version": {"type": "string"},
        "id": {"type": "string", "minLength": 1},
        "properties": {
            "type": "object",
            "required": [
                "mlm:name",
                "mlm:architecture",
                "mlm:tasks",
                "mlm:input",
                "mlm:output",
            ],
            "properties": {
                "mlm:name": {"type": "string", "minLength": 1},
                "mlm:architecture": {"type": "string", "minLength": 1},
                "mlm:tasks": {
                    "type": "array",
                    "minItems": 1,
                    "items": {"type": "string", "minLength": 1},
                },
                "mlm:framework": {"type": "string"},
                "mlm:framework_version": {"type": "string"},
                "mlm:memory_size": {"type": "integer", "minimum": 0},
                "mlm:total_parameters": {"type": "integer", "minimum": 0},
                "mlm:pretrained": {"type": "boolean"},
                "mlm:pretrained_source": {
                    "oneOf": [{"type": "null"}, {"type": "string"}]
                },
                "mlm:batch_size_suggestion": {
                    "type": "integer",
                    "minimum": 1,
                },
                "mlm:accelerator": {
                    "oneOf": [{"type": "null"}, {"type": "string"}]
                },
                "mlm:accelerator_constrained": {"type": "boolean"},
                "mlm:accelerator_count": {"type": "integer", "minimum": 1},
                "mlm:hyperparameters": {"type": "object"},
                "mlm:input": {
                    "type": "array",
                    "minItems": 1,
                    "items": _MODEL_INPUT,
                },
                "mlm:output": {
                    "type": "array",
                    "minItems": 1,
                    "items": _MODEL_OUTPUT,
                },
            },
        },
        "assets": {"type": "object"},
    },
}


def validate_mlm_item(item: dict) -> None:
    """Validate a STAC Item dict against the vendored MLM schema.

    Raises ``ValueError`` listing EVERY violation with its JSON
    pointer (the reference surfaces pystac's single-error equivalent;
    all-at-once is strictly more useful for hand-authored items).
    No-op with a stated reason if ``jsonschema`` is unavailable —
    the structural checks in ``load_stac_ml`` still run.
    """
    try:
        import jsonschema
    except ImportError:  # pragma: no cover - baked into this env
        return
    validator = jsonschema.Draft202012Validator(MLM_ITEM_SCHEMA)
    errors = sorted(validator.iter_errors(item), key=lambda e: list(e.absolute_path))
    if not errors:
        return
    lines = []
    for e in errors:
        ptr = "/" + "/".join(str(p) for p in e.absolute_path)
        lines.append(f"  {ptr or '/'}: {e.message}")
    raise ValueError(
        "STAC-MLM item failed schema validation "
        f"({len(errors)} violation(s)):\n" + "\n".join(lines)
    )
