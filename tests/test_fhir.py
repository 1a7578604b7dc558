"""FHIR bundle ETL test (FIXTURES §2.5 shapes, skip rules, SNOMED map)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from id3c_spark.etl import fhir
from id3c_spark.etl.warehouse import Warehouse
from tests import fixtures


def bundle_doc():
    return {
        "resourceType": "Bundle", "type": "collection", "id": "bundle-1",
        "entry": [
            {"fullUrl": "urn:uuid:patient-1", "resource": {
                "resourceType": "Patient",
                "identifier": [{"system": "https://seattleflu.org/individual", "value": "fhir-indiv-1"}],
                "gender": "female"}},
            {"fullUrl": "urn:uuid:encounter-1", "resource": {
                "resourceType": "Encounter",
                "identifier": [{"system": "https://seattleflu.org/encounter", "value": "fhir-enc-1"}],
                "status": "finished",
                "period": {"start": "2020-02-01T09:00:00-08:00"},
                "subject": {"reference": "urn:uuid:patient-1"},
                "location": [
                    {"location": {"identifier": {"system": "https://seattleflu.org/site", "value": "UW-Club"}}},
                ]}},
            {"fullUrl": "urn:uuid:specimen-1", "resource": {
                "resourceType": "Specimen",
                "identifier": [{"system": "https://seattleflu.org/sample", "value": "11112222"}],
                "collection": {"collectedDateTime": "2020-02-01"}}},
            {"fullUrl": "urn:uuid:observation-1", "resource": {
                "resourceType": "Observation", "status": "final",
                "code": {"coding": []},
                "encounter": {"reference": "urn:uuid:encounter-1"},
                "specimen": {"reference": "urn:uuid:specimen-1"}}},
            {"fullUrl": "urn:uuid:qr-1", "resource": {
                "resourceType": "QuestionnaireResponse", "status": "completed",
                "encounter": {"reference": "urn:uuid:encounter-1"},
                "item": [{"linkId": "age", "answer": [{"valueInteger": 34}]},
                         {"linkId": "age_months", "answer": [{"valueInteger": 415}]}]}},
            {"fullUrl": "urn:uuid:observation-2", "resource": {
                "resourceType": "Observation", "status": "final",
                "code": {"coding": [{"system": "http://snomed.info/sct", "code": "10828004"}]},
                "valueBoolean": True,
                "device": {"identifier": {"value": "OpenArray"}},
                "specimen": {"reference": "urn:uuid:specimen-1"}}},
            {"fullUrl": "urn:uuid:observation-3", "resource": {    # inconclusive → skipped
                "resourceType": "Observation", "status": "final",
                "code": {"coding": [{"system": "http://snomed.info/sct", "code": "911000124104"}]},
                "specimen": {"reference": "urn:uuid:specimen-1"}}},
        ],
    }


def skip_bundles():
    no_patient = {"resourceType": "Bundle", "type": "collection", "id": "skip-1",
                  "entry": [{"fullUrl": "urn:uuid:enc-x", "resource": {
                      "resourceType": "Encounter",
                      "identifier": [{"system": "https://seattleflu.org/encounter", "value": "lonely-enc"}],
                      "period": {"start": "2020-01-01T00:00:00Z"}}}]}
    patient_no_encounter = {"resourceType": "Bundle", "type": "collection", "id": "skip-2",
                            "entry": [{"fullUrl": "urn:uuid:pat-x", "resource": {
                                "resourceType": "Patient",
                                "identifier": [{"system": "https://seattleflu.org/individual",
                                                "value": "lonely-patient"}],
                                "gender": "male"}}]}
    return [no_patient, patient_no_encounter]


def test_fhir_etl(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ids = spark.createDataFrame(
        fixtures.identifier_rows(), "uuid string, barcode string, identifier_set_id long"
    )
    docs = [bundle_doc()] + skip_bundles()
    receiving = spark.createDataFrame(
        [(i + 1, json.dumps(d)) for i, d in enumerate(docs)], "id long, document string"
    ).withColumn("received", F.current_timestamp())

    stats = fhir.run(spark, receiving, wh, ids)
    assert stats["bundles"] == 3
    assert stats["valid_bundles"] == 1          # both skip rules applied

    ind = {r.identifier: r.sex for r in wh.read("individual").collect()}
    assert ind == {"fhir-indiv-1": "female"}    # lonely-patient skipped

    enc = {r.identifier: r for r in wh.read("encounter").collect()}
    assert set(enc) == {"fhir-enc-1"}
    assert enc["fhir-enc-1"].age_months == 415  # age_months preferred over age*12
    assert str(enc["fhir-enc-1"].encountered).startswith("2020-02-01 17:00")  # UTC

    smp = wh.read("sample").collect()
    assert len(smp) == 1
    assert smp[0].identifier == fixtures.SAMPLE_BARCODES["11112222"]
    assert str(smp[0].collected) == "2020-02-01"
    assert smp[0].encounter_id == enc["fhir-enc-1"].encounter_id

    pa = (
        wh.read("presence_absence")
        .join(wh.read("target").select("target_id", F.col("identifier").alias("target")), "target_id")
        .collect()
    )
    assert len(pa) == 1                          # inconclusive skipped
    assert pa[0].target == "snomed/10828004"
    assert pa[0].present is True

    assert {r.identifier for r in wh.read("site").collect()} == {"uw-club"}
