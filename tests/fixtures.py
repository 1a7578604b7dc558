"""Deterministic synthetic fixtures per FIXTURES.md: receiving documents +
identifier seed rows for the domain-ETL tests.

Barcode discipline (identifier.sql:31-42): barcode = last 8 chars of the
uuid; sample barcodes and collection barcodes live in different identifier
sets (set 1 = 'samples', set 2 = 'collections'), exactly like the
reference — the manifest ETL is what links a sample barcode to a
collection barcode on one warehouse row.
"""

from __future__ import annotations

import json

SAMPLE_BARCODES = {  # barcode → uuid (set 1: samples)
    "11112222": "aaaaaaaa-0000-0000-0000-000011112222",
    "33334444": "aaaaaaaa-0000-0000-0000-000033334444",
}

COLLECTION_BARCODES = {  # barcode → uuid (set 2: collections)
    "aabbccdd": "bbbbbbbb-0000-0000-0000-0000aabbccdd",
    "bbccddee": "bbbbbbbb-0000-0000-0000-0000bbccddee",
    "ccddeeff": "bbbbbbbb-0000-0000-0000-0000ccddeeff",
}


def identifier_rows():
    return [(u, b, 1) for b, u in SAMPLE_BARCODES.items()] + [
        (u, b, 2) for b, u in COLLECTION_BARCODES.items()
    ]


def enrollment_documents():
    doc1 = {
        "id": "enc-1", "schemaVersion": "1.1.0", "participant": "indiv-1",
        "startTimestamp": "2019-12-30T12:00:00Z",
        "site": {"name": "HMC", "type": "clinic"},
        "age": {"value": 34.5, "ninetyOrAbove": False},
        "locations": [{"use": "home", "region": "53033000100"}],
        "sampleCodes": [{"type": "ClinicSwab", "code": "AABBCCDD"}],
        "responses": [
            {"question": {"token": "AssignedSex"},
             "answer": {"type": "Option", "chosenOptions": [1]},
             "options": [{"token": "male"}, {"token": "female"}]},
            {"question": {"token": "Symptoms"},
             "answer": {"type": "Option", "chosenOptions": [0, 1]},
             "options": [{"token": "cough"}, {"token": "fever"}]},
        ],
    }
    doc2 = {
        "id": "enc-2", "schemaVersion": "1.0.0", "participant": "indiv-2",
        "startTimestamp": "2020-01-02T09:30:00-08:00",
        "site": {"name": "UW-Club", "type": "kiosk"},
        "age": {"value": 92.0, "ninetyOrAbove": True},     # caps at 90y
        "locations": [],
        "sampleCodes": [{"type": "ScannedSelfSwab", "code": "BBCCDDEE"},
                        {"type": "Unknown", "code": "zzz"}],  # unknown type skipped
        "responses": [
            {"question": {"token": "AssignedSex"},
             "answer": {"type": "Option", "chosenOptions": [0]},
             "options": [{"token": "male"}, {"token": "female"}]},
        ],
    }
    doc3 = {"id": "enc-3", "schemaVersion": "9.9.9"}       # unknown version → skip
    return [(i + 1, json.dumps(d)) for i, d in enumerate([doc1, doc2, doc3])]


def manifest_documents():
    """Links sample barcodes to the enrollments' collection barcodes."""
    docs = [
        {"sample": "11112222", "collection": "AABBCCDD", "date": "3/15/2020",
         "sample_type": "utm", "aliquots": ["a1", "a2"],
         "_provenance": {"workbook": "w.xlsx", "row": 2}},
        {"sample": "33334444", "collection": "bbccddee", "date": "2020-03-16",
         "sample_type": "rdt"},
        {"sample": "zzzzzzzz", "collection": None, "date": "bogus"},  # unknown → skip
        {"sample": None, "collection": None},                          # dropna
    ]
    return [(i + 1, json.dumps(d)) for i, d in enumerate(docs)]


def pa_documents():
    """Presence-absence receiving docs (FIXTURES §2.1) covering the skip
    rules and the re-test-as-correction path. investigatorId = sample
    barcodes (set 1)."""
    doc1 = {"samples": [
        {"investigatorId": "11112222", "sampleId": 101, "chip": "chip-A1",
         "sampleFailed": False, "isCurrentExpressionResult": True,
         "targetResults": [
             {"geneTarget": "Flu_A_pan", "controlStatus": "NotControl", "targetStatus": "Detected"},
             {"geneTarget": "RSV", "controlStatus": "NotControl", "targetStatus": "NotDetected"},
             {"geneTarget": "PhiX_Control", "controlStatus": "PositiveControl", "targetStatus": "Positive"},
             {"geneTarget": "Flu_B_pan", "controlStatus": "NotControl", "targetStatus": "Indeterminate"},
             {"geneTarget": "Adeno", "controlStatus": "NotControl", "targetStatus": "Fail"},      # skipped
         ]},
        {"investigatorId": "33334444", "sampleId": 102, "chip": None,
         "sampleFailed": False, "isCurrentExpressionResult": True,
         "targetResults": [
             {"geneTarget": "Flu_A_pan", "controlStatus": "NotControl", "targetStatus": "Negative"},
         ]},
        {"investigatorId": None, "sampleId": 103, "chip": None, "sampleFailed": False, "isCurrentExpressionResult": True,
         "targetResults": [{"geneTarget": "RSV", "controlStatus": "NotControl", "targetStatus": "Detected"}]},
        {"investigatorId": "UNKNOWN1", "sampleId": 104, "chip": None, "sampleFailed": False, "isCurrentExpressionResult": True,
         "targetResults": [{"geneTarget": "RSV", "controlStatus": "NotControl", "targetStatus": "Detected"}]},
        {"investigatorId": "33334444", "sampleId": 106, "chip": None, "sampleFailed": False,
         # out-of-date (isCurrentExpressionResult missing) → skipped
         "targetResults": [{"geneTarget": "RSV", "controlStatus": "NotControl", "targetStatus": "Detected"}]},
        {"investigatorId": "11112222", "sampleId": 105, "chip": None, "sampleFailed": True, "isCurrentExpressionResult": True,  # failed → skip
         "targetResults": [{"geneTarget": "RSV", "controlStatus": "NotControl", "targetStatus": "Detected"}]},
    ]}
    doc2 = {"store": "old-format"}    # skipped wholesale
    doc3 = {"samples": [              # re-test correction: sample 101 Flu_A flips
        {"investigatorId": "11112222", "sampleId": 101, "chip": "chip-A1",
         "sampleFailed": False, "isCurrentExpressionResult": True,
         "targetResults": [
             {"geneTarget": "Flu_A_pan", "controlStatus": "NotControl", "targetStatus": "NotDetected"},
         ]},
    ]}
    return [(i + 1, json.dumps(d)) for i, d in enumerate([doc1, doc2, doc3])]


TRACT_HIERARCHY = {"country": "us", "state": "wa", "tract": "53033000100"}


def seed_tract(warehouse):
    """Seed the census tract the enrollment fixtures reference — the
    reference requires tracts to pre-exist (enrollments.py:198-200)."""
    warehouse.publish("location", warehouse.spark.createDataFrame(
        [(100, "53033000100", "tract", TRACT_HIERARCHY, None, None, None, None)],
        warehouse.read("location").schema,
    ))
