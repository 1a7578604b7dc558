"""Web API surface (reference: lib/id3c/api/routes.py, SURVEY §3.2).

Same contract re-homed: POST endpoints append raw documents to the
receiving NDJSON log (exact body text preserved, json-object validation as
the constraint backstop → 400, routes.py/datastore.py:535-552); GET/POST
lookups serve the identifier dimension. Ingestion is storage-level (no
Spark session needed per request); the ETLs consume the log asynchronously
— identical to the reference where the web API only ever touches
receiving + small lookups, never the warehouse write path.
"""

from __future__ import annotations

import json
import os
import threading

from flask import Flask, jsonify, request

RECEIVING_ENDPOINTS = {
    "enrollments": "enrollment",
    "presence-absence": "presence_absence",
    "sequence-read-sets": "sequence_read_set",
    "consensus-genome": "consensus_genome",
    "redcap-det": "redcap_det",
    "fhir": "fhir",
    "manifests": "manifest",
}


def create_app(receiving_dir: str, identifiers_parquet: str | None = None) -> Flask:
    app = Flask("id3c_spark_api")
    os.makedirs(receiving_dir, exist_ok=True)
    lock = threading.Lock()

    barcodes: dict[str, dict] = {}
    if identifiers_parquet and os.path.exists(identifiers_parquet):
        import pyarrow.parquet as pq

        tbl = pq.read_table(identifiers_parquet).to_pylist()
        barcodes = {row["barcode"].lower(): row for row in tbl}

    def append(table: str, body: str) -> None:
        with lock:  # single-writer append, like one Postgres INSERT
            with open(os.path.join(receiving_dir, f"{table}.ndjson"), "a") as f:
                f.write(body.replace("\n", " ") + "\n")

    @app.post("/v1/receiving/<name>")
    def receive(name: str):
        table = RECEIVING_ENDPOINTS.get(name)
        if table is None:
            return jsonify(error=f"unknown endpoint {name}"), 404
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

    @app.get("/v1/warehouse/identifier/<barcode>")
    def identifier(barcode: str):
        row = barcodes.get(barcode.lower())   # citext semantics
        if row is None:
            return jsonify(error="not found"), 404
        return jsonify(uuid=row["uuid"], barcode=row["barcode"],
                       identifier_set_id=row["identifier_set_id"])

    @app.post("/v1/verification/barcode-uses/verify")
    def verify_barcodes():
        """VALUES-list lookup join parity (api/datastore.py:206-233)."""
        payload = request.get_json(silent=True)
        if not isinstance(payload, list):
            return jsonify(error="expected a JSON list of barcodes"), 400
        out = [
            {"barcode": b,
             "known": b.lower() in barcodes,
             "identifier_set_id": barcodes.get(b.lower(), {}).get("identifier_set_id")}
            for b in payload
        ]
        return jsonify(out)

    return app
