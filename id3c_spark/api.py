"""Web API surface (reference: lib/id3c/api/routes.py, SURVEY §3.2).

Same contract re-homed: POST endpoints append raw documents to the
receiving NDJSON log (exact body text preserved, json-object validation as
the constraint backstop → 400, routes.py/datastore.py:535-552); GET/POST
lookups serve the identifier dimension. Ingestion is storage-level (no
Spark session needed per request); the ETLs consume the log asynchronously
— identical to the reference where the web API only ever touches
receiving + small lookups, never the warehouse write path.

Error surface parity (routes.py:37-173, utils/routes.py:43-93):
  - wrong Content-Type → 415 (content_types_accepted);
  - Content-Length above the configured cap → 413 (check_content_length);
  - schema-validated bodies (validation.py mirrors api/schemas.py) → 400
    with the validation message, exactly ``return str(e), 400``;
  - non-object documents → 400 (the json_typeof constraint backstop);
  - unknown endpoints / barcodes → 404.
"""

from __future__ import annotations

import json
import os
import re
import threading
from datetime import datetime

from flask import Flask, jsonify, request

from id3c_spark.validation import (
    POST_INCIDENT_SCHEMA,
    POST_SAMPLE_SCHEMA,
    VERIFY_BARCODE_USES_SCHEMA,
    SchemaValidationError,
    validate,
)

RECEIVING_ENDPOINTS = {
    "enrollments": "enrollment",
    "presence-absence": "presence_absence",
    "sequence-read-sets": "sequence_read_set",
    "consensus-genome": "consensus_genome",
    "fhir": "fhir",
    "manifests": "manifest",
}

MAX_CONTENT_LENGTH = 20 * 1024 * 1024  # check_content_length cap

_BARCODE_RE = re.compile(r"[a-fA-F0-9]{8}")

# warehouse.identifier_set_use seed rows (identifier-set-use/data.sql:6-13)
IDENTIFIER_SET_USES = [
    {"use": "sample", "description": "Identifiers for samples received and processed by the lab"},
    {"use": "collection", "description": "Identifiers for collection tubes"},
    {"use": "clia", "description": "Secondary identifiers for CLIA compliance"},
    {"use": "kit", "description": "Identifiers for test kits"},
    {"use": "test-strip", "description": "Identifiers for test strips"},
]


def _content_type_error(allowed: tuple[str, ...]):
    """content_types_accepted parity (utils/routes.py:43-68): reject a
    request whose declared mimetype is not in *allowed* with 415. Missing
    Content-Type (bodyless test requests) passes, like ``None in allowed``."""
    if request.mimetype and request.mimetype not in allowed:
        return (
            jsonify(error=f"Body data Content-Type must be one of {sorted(allowed)}"),
            415,
        )
    return None


def _content_length_error():
    """check_content_length parity (utils/routes.py:77-93) → 413."""
    if request.content_length is not None and request.content_length > MAX_CONTENT_LENGTH:
        return (
            jsonify(error=f"Content-Length exceeded {MAX_CONTENT_LENGTH} bytes"),
            413,
        )
    return None


def create_app(
    receiving_dir: str,
    identifiers_parquet: str | None = None,
    set_uses: dict[int, str] | None = None,
) -> Flask:
    app = Flask("id3c_spark_api")
    os.makedirs(receiving_dir, exist_ok=True)
    lock = threading.Lock()
    set_uses = set_uses or {}

    barcodes: dict[str, dict] = {}
    if identifiers_parquet and os.path.exists(identifiers_parquet):
        import pyarrow.parquet as pq

        tbl = pq.read_table(identifiers_parquet).to_pylist()
        barcodes = {row["barcode"].lower(): row for row in tbl}

    def append(table: str, body: str) -> None:
        with lock:  # single-writer append, like one Postgres INSERT
            with open(os.path.join(receiving_dir, f"{table}.ndjson"), "a") as f:
                f.write(body.replace("\n", " ") + "\n")

    def guarded(allowed: tuple[str, ...] = ("application/json",)):
        return _content_type_error(allowed) or _content_length_error()

    @app.post("/v1/receiving/<name>")
    def receive(name: str):
        table = RECEIVING_ENDPOINTS.get(name)
        if table is None:
            return jsonify(error=f"unknown endpoint {name}"), 404
        # FHIR documents arrive as application/fhir+json (routes.py:136-139)
        allowed = ("application/fhir+json",) if name == "fhir" else ("application/json",)
        if err := guarded(allowed):
            return err
        body = request.get_data(as_text=True)
        try:
            doc = json.loads(body)
        except json.JSONDecodeError:
            return jsonify(error="body is not valid JSON"), 400
        if not isinstance(doc, dict):
            # json_typeof(document) = 'object' constraint backstop
            return jsonify(error="document must be a JSON object"), 400
        append(table, body)
        return jsonify(status="accepted", table=table), 201

    @app.post("/v1/receiving/redcap-det")
    def receive_redcap_det():
        """DETs arrive form-encoded and are stored as JSON
        (routes.py:119-133)."""
        if err := guarded(("application/x-www-form-urlencoded",)):
            return err
        document = request.form.to_dict()
        append("redcap_det", json.dumps(document))
        return jsonify(status="accepted", table="redcap_det"), 201

    @app.post("/v1/receiving/manifest/incident")
    def receive_manifest_incident():
        """Schema-validated incident manifests (routes.py:153-173)."""
        if err := guarded():
            return err
        document = request.get_json(silent=True)
        try:
            validate(POST_INCIDENT_SCHEMA, document)
        except SchemaValidationError as e:
            return str(e), 400
        append("manifest", json.dumps(document))
        return "", 204

    @app.post("/v1/warehouse/sample")
    def post_sample():
        """Validated sample create/update (routes.py:325-385): schema
        check, YYYY-MM-DD → MM/DD/YYYY date normalization, rack_*/aliquot_*
        folded into arrays — then staged for the sample ETL."""
        if err := guarded():
            return err
        sample = request.get_json(silent=True)
        try:
            validate(POST_SAMPLE_SCHEMA, sample)
        except SchemaValidationError as e:
            return str(e), 400
        for key in list(sample):
            if key.endswith("_date"):
                try:
                    sample[key] = datetime.strptime(sample[key], "%Y-%m-%d").strftime("%m/%d/%Y")
                except ValueError:
                    pass
        racks = [k for k in sample if k.startswith("rack_")]
        if racks:
            sample["racks"] = [sample.pop(k) for k in racks]
        aliquots = [k for k in sample if k.startswith("aliquot_")]
        if aliquots:
            sample["aliquots"] = [sample.pop(k) for k in aliquots]
        append("sample", json.dumps(sample))
        return jsonify(sample=sample, status="received"), 200

    @app.get("/v1/warehouse/sample")
    @app.get("/v1/warehouse/sample/<barcode>")
    def get_sample(barcode: str | None = None):
        """Barcode-format guard parity (routes.py:300-318) → 400."""
        if not barcode:
            barcode = request.args.get("collection_barcode")
            if not barcode:
                return jsonify(error="Missing required argument"), 400
        if not _BARCODE_RE.match(barcode):
            return jsonify(error="Invalid barcode format"), 400
        row = barcodes.get(barcode.lower())
        if row is None:
            return jsonify(error="not found"), 404
        return jsonify(uuid=row["uuid"], barcode=row["barcode"])

    # --- identifier sets (routes.py:221-283; datastore.py:272-360) ---------
    sets_path = os.path.join(receiving_dir, "identifier_sets.json")

    def load_sets() -> dict:
        if os.path.exists(sets_path):
            with open(sets_path) as f:
                return json.load(f)
        return {}

    def save_sets(sets: dict) -> None:
        with lock:
            with open(sets_path, "w") as f:
                json.dump(sets, f, indent=2, sort_keys=True)

    @app.get("/v1/warehouse/identifier-sets")
    def get_identifier_sets():
        sets = load_sets()
        return jsonify([
            {"name": n, "use": s.get("use"), "description": s.get("description")}
            for n, s in sorted(sets.items())
        ])

    @app.get("/v1/warehouse/identifier-sets/<name>")
    def get_identifier_set(name: str):
        s = load_sets().get(name)
        if s is None:
            return jsonify(error=f"Identifier set {name!r} not found"), 404
        return jsonify(name=name, use=s.get("use"), description=s.get("description"))

    @app.put("/v1/warehouse/identifier-sets/<name>")
    def put_identifier_set(name: str):
        """make_identifier_set semantics (routes.py:249-283): create the set
        (use required for new sets), update provided fields on existing ones;
        201 when created or updated, 204 when unchanged."""
        if err := guarded(("application/x-www-form-urlencoded", "multipart/form-data")):
            return err
        fields = {k: v for k, v in request.form.items() if k in ("use", "description")}
        if "use" in fields and fields["use"] not in {u["use"] for u in IDENTIFIER_SET_USES}:
            # the use FK constraint → 400 (datastore BadRequestDatabaseError)
            return jsonify(error=f"unknown use {fields['use']!r}"), 400
        sets = load_sets()
        existing = sets.get(name)
        if existing is None:
            if "use" not in fields:
                return jsonify(error="use is required for new identifier sets"), 400
            sets[name] = {"use": fields["use"],
                          "description": fields.get("description")}
            save_sets(sets)
            return "", 201
        updated = {**existing, **fields}
        if updated == existing:
            return "", 204
        sets[name] = updated
        save_sets(sets)
        return "", 201

    @app.get("/v1/warehouse/identifier-set-uses")
    def get_identifier_set_uses():
        return jsonify(IDENTIFIER_SET_USES)

    @app.get("/v1/warehouse/identifier/<barcode>")
    def identifier(barcode: str):
        row = barcodes.get(barcode.lower())   # citext semantics
        if row is None:
            return jsonify(error="not found"), 404
        return jsonify(uuid=row["uuid"], barcode=row["barcode"],
                       identifier_set_id=row["identifier_set_id"])

    @app.post("/v1/verification/barcode-uses/verify")
    def verify_barcodes():
        """Reference contract (routes.py:178-203): a JSON array of
        {barcode, use} objects → same order out, plus barcode_found and
        use_match (null when not found). Body is schema-validated."""
        if err := guarded():
            return err
        payload = request.get_json(silent=True)
        try:
            validate(VERIFY_BARCODE_USES_SCHEMA, payload)
        except SchemaValidationError as e:
            return str(e), 400
        out = []
        for item in payload:
            row = barcodes.get(item["barcode"].lower())
            found = row is not None
            use = set_uses.get(row["identifier_set_id"]) if found else None
            out.append({
                "barcode": item["barcode"],
                "use": item["use"],
                "barcode_found": found,
                "use_match": (use == item["use"]) if found and use is not None else (None if not found else False),
            })
        return jsonify(out)

    # Load extra routes from extensions — after the built-in declarations
    # so plugins may customize existing routes (reference
    # api/routes.py:386-397). Discovery: entry-point group
    # id3c_spark.api.routes + the ID3C_SPARK_API_PLUGINS env hook.
    from id3c_spark.plugins import load_api_plugins

    load_api_plugins(app)

    return app
