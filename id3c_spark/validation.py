"""Request-body schema validation (reference: lib/id3c/api/schemas.py +
routes.py:37-173 error surface).

The schemas are the reference's Draft-7 documents verbatim; the validator
is a dependency-free implementation of exactly the subset those schemas
use — type, properties/additionalProperties, required, anyOf(required),
enum, minLength/maxLength, items, format:date — raising
``SchemaValidationError`` with jsonschema-style messages so routes can map
them to 400 responses the way routes.py does (``return str(e), 400``).
"""

from __future__ import annotations

import re
from typing import Any

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

_TYPES = {
    "object": dict,
    "array": list,
    "string": str,
    "number": (int, float),
    "integer": int,
    "boolean": bool,
}


class SchemaValidationError(ValueError):
    """Body failed schema validation — routes map this to HTTP 400."""


def validate(schema: dict, doc: Any, path: str = "$") -> None:
    """Validate *doc* against the Draft-7 subset *schema*; raise
    SchemaValidationError on the first violation."""
    t = schema.get("type")
    if t is not None:
        py = _TYPES.get(t)
        if py is None:
            raise SchemaValidationError(f"{path}: unsupported schema type {t!r}")
        if not isinstance(doc, py) or (t in ("number", "integer") and isinstance(doc, bool)):
            raise SchemaValidationError(f"{path}: {doc!r} is not of type {t!r}")

    if "enum" in schema and doc not in schema["enum"]:
        raise SchemaValidationError(f"{path}: {doc!r} is not one of {schema['enum']!r}")

    if isinstance(doc, str):
        if "minLength" in schema and len(doc) < schema["minLength"]:
            raise SchemaValidationError(f"{path}: {doc!r} is shorter than {schema['minLength']}")
        if "maxLength" in schema and len(doc) > schema["maxLength"]:
            raise SchemaValidationError(f"{path}: {doc!r} is longer than {schema['maxLength']}")
        if schema.get("format") == "date" and not _DATE_RE.match(doc):
            raise SchemaValidationError(f"{path}: {doc!r} is not a 'date' (YYYY-MM-DD)")

    if isinstance(doc, dict):
        props = schema.get("properties", {})
        for key in schema.get("required", []):
            if key not in doc:
                raise SchemaValidationError(f"{path}: {key!r} is a required property")
        if schema.get("additionalProperties") is False:
            extra = set(doc) - set(props)
            if extra:
                raise SchemaValidationError(
                    f"{path}: additional properties are not allowed ({sorted(extra)!r})"
                )
        for key, sub in props.items():
            if key in doc:
                validate(sub, doc[key], f"{path}.{key}")
        if "anyOf" in schema:
            errors = []
            for i, alt in enumerate(schema["anyOf"]):
                try:
                    validate(alt, doc, f"{path}<anyOf[{i}]>")
                    break
                except SchemaValidationError as e:
                    errors.append(str(e))
            else:
                raise SchemaValidationError(
                    f"{path}: not valid under any of the given schemas: {'; '.join(errors)}"
                )

    if isinstance(doc, list) and "items" in schema:
        for i, item in enumerate(doc):
            validate(schema["items"], item, f"{path}[{i}]")


# --- reference schemas (lib/id3c/api/schemas.py, verbatim contract) ---------

VERIFY_BARCODE_USES_SCHEMA = {
    "type": "array",
    "items": {
        "type": "object",
        "properties": {
            "barcode": {"type": "string"},
            "use": {"type": "string"},
        },
        "required": ["barcode", "use"],
    },
}

_SWAB_TYPES = ["ans", "mtb", "np", "tiny", "unk", "none"]
_COLLECTION_MATRICES = ["dry", "utm_vtm", "pbs", "none"]

POST_SAMPLE_SCHEMA = {
    "type": "object",
    "properties": {
        "sample_id": {"type": "string", "minLength": 8, "maxLength": 8},
        "collection_id": {"type": "string", "minLength": 8, "maxLength": 8},
        "collection_date": {"type": "string", "format": "date"},
        "sample_origin": {"type": "string"},
        "swab_site": {"type": "string"},
        "clia_id": {"type": "string", "minLength": 8, "maxLength": 8},
        "received_date": {"type": "string", "format": "date"},
        "aliquot_a": {"type": "string"},
        "aliquot_b": {"type": "string"},
        "aliquot_c": {"type": "string"},
        "aliquoted_date": {"type": "string", "format": "date"},
        "rack_a": {"type": "string"},
        "rack_a_nickname": {"type": "string"},
        "rack_b": {"type": "string"},
        "rack_b_nickname": {"type": "string"},
        "rack_c": {"type": "string"},
        "rack_c_nickname": {"type": "string"},
        "swab_type": {"type": "string", "enum": _SWAB_TYPES},
        "collection_matrix": {"type": "string", "enum": _COLLECTION_MATRICES},
        "notes": {"type": "string"},
        "access_role": {"type": "string"},
    },
    "anyOf": [{"required": ["sample_id"]}, {"required": ["collection_id"]}],
    "additionalProperties": False,
}

POST_INCIDENT_SCHEMA = {
    "type": "object",
    "properties": {
        "collection": {"type": "string", "minLength": 8, "maxLength": 8},
        "incident_date": {"type": "string", "format": "date"},
        "failure_type": {"type": "string"},
        "swab_type": {"type": "string", "enum": _SWAB_TYPES},
        "collection_matrix": {"type": "string", "enum": _COLLECTION_MATRICES},
        "corrective_action": {
            "type": "string",
            "enum": ["discarded", "continued processing"],
        },
    },
    "required": ["collection"],
    "additionalProperties": False,
}
