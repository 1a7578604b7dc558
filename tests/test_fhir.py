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


def enriched_bundle():
    """Bundle exercising the details long tail: patient language, encounter
    reason/provenance/partOf, and the non-site location cascade."""
    return {
        "resourceType": "Bundle", "type": "collection", "id": "bundle-2",
        "entry": [
            {"fullUrl": "urn:uuid:patient-2", "resource": {
                "resourceType": "Patient",
                "identifier": [{"system": "https://seattleflu.org/individual", "value": "fhir-indiv-2"}],
                "gender": "unknown",
                "communication": [
                    {"language": {"coding": [{"system": "urn:ietf:bcp:47", "code": "es"}]},
                     "preferred": True},
                    {"language": {"coding": [{"system": "urn:ietf:bcp:47", "code": "en"}]},
                     "preferred": False},
                ]}},
            {"fullUrl": "urn:uuid:parent-enc", "resource": {
                "resourceType": "Encounter",
                "identifier": [{"system": "https://seattleflu.org/encounter", "value": "parent-enc-1"}],
                "status": "finished",
                "period": {"start": "2020-03-01T08:00:00Z"},
                "subject": {"reference": "urn:uuid:patient-2"},
                "location": [
                    {"location": {"identifier": {"system": "https://seattleflu.org/site", "value": "Clinic"}}},
                ]}},
            {"fullUrl": "urn:uuid:encounter-2", "resource": {
                "resourceType": "Encounter",
                "identifier": [{"system": "https://seattleflu.org/encounter", "value": "fhir-enc-2"}],
                "status": "finished",
                "period": {"start": "2020-03-02T09:00:00Z"},
                "subject": {"reference": "urn:uuid:patient-2"},
                "partOf": {"reference": "urn:uuid:parent-enc"},
                "meta": {"source": 'data:application/json,{"workflow":"self-test"}'},
                "reasonCode": [{"coding": [
                    {"system": "http://snomed.info/sct", "code": "840539006", "display": "COVID-19"},
                ]}],
                "location": [
                    {"location": {"identifier": {"system": "https://seattleflu.org/site", "value": "Clinic"}}},
                    {"location": {"reference": "urn:uuid:loc-home"}},
                ]}},
            {"fullUrl": "urn:uuid:loc-home", "resource": {
                "resourceType": "Location",
                "identifier": [{"system": "https://seattleflu.org/location/address", "value": "addr-123"}],
                "type": [{"coding": [
                    {"system": "http://terminology.hl7.org/CodeSystem/v3-RoleCode", "code": "PTRES"},
                ]}],
                "partOf": {"reference": "urn:uuid:loc-tract"}}},
            {"fullUrl": "urn:uuid:loc-tract", "resource": {
                "resourceType": "Location",
                "identifier": [{"system": "https://seattleflu.org/location/tract", "value": "53033000100"}],
                "type": [{"coding": [
                    {"system": "http://terminology.hl7.org/CodeSystem/v3-RoleCode", "code": "PTRES"},
                ]}]}},
        ],
    }


def test_fhir_details_and_locations(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    # seed the tract like the reference's find_location precondition
    wh.publish("location", spark.createDataFrame(
        [(100, "53033000100", "tract", {"country": "us", "tract": "53033000100"},
          None, None, None, None)],
        wh.read("location").schema,
    ))
    ids = spark.createDataFrame(
        fixtures.identifier_rows(), "uuid string, barcode string, identifier_set_id long"
    )
    receiving = spark.createDataFrame(
        [(1, json.dumps(enriched_bundle()))], "id long, document string"
    ).withColumn("received", F.current_timestamp())

    stats = fhir.run(spark, receiving, wh, ids)
    assert stats["valid_bundles"] == 1

    # gender 'unknown' → null sex (fhir.py:401-405)
    ind = {r.identifier: r for r in wh.read("individual").collect()}
    assert ind["fhir-indiv-2"].sex is None

    enc = {r.identifier: r for r in wh.read("encounter").collect()}
    assert set(enc) == {"fhir-enc-2", "parent-enc-1"}
    details = json.loads(enc["fhir-enc-2"].details)
    assert details["language"] == "es"                       # preferred bcp-47
    assert details["part_of"] == "parent-enc-1"
    assert details["_provenance"] == {"workflow": "self-test"}
    assert details["reason"] == [
        {"system": "http://snomed.info/sct", "code": "840539006", "display": "COVID-19"}]
    # the parent encounter shares the patient → its details carry the
    # language but none of the child-only enrichment
    parent_details = json.loads(enc["parent-enc-1"].details)
    assert parent_details == {"language": "es"}

    # location cascade: address upserted under the tract hierarchy and the
    # encounter_location row points at the address (fhir.py:826-876)
    locs = {(r.scale, r.identifier): r for r in wh.read("location").collect()}
    assert ("address", "addr-123") in locs
    assert locs[("address", "addr-123")].hierarchy == {"country": "us", "tract": "53033000100"}
    els = wh.read("encounter_location").collect()
    assert stats["encounter_locations"] == 1 and len(els) == 1
    assert els[0].relation == "residence"
    assert els[0].encounter_id == enc["fhir-enc-2"].encounter_id
    assert els[0].location_id == locs[("address", "addr-123")].location_id


def test_parse_data_uri_json():
    assert fhir.parse_data_uri_json('data:application/json,{"foo":"bar"}') == '{"foo":"bar"}'
    assert fhir.parse_data_uri_json(
        "data:application/json,%7B%22foo%22%3A%22bar%22%7D") == '{"foo":"bar"}'
    assert fhir.parse_data_uri_json(
        "data:application/json;base64,eyJmb28iOiJiYXIifQo=") == '{"foo":"bar"}'
    assert fhir.parse_data_uri_json("data:text/plain,someplace somewhere") == \
        '"data:text/plain,someplace somewhere"'
    assert fhir.parse_data_uri_json("https://example.com") == '"https://example.com"'
    assert fhir.parse_data_uri_json("data:application/json,bogus") == \
        '"data:application/json,bogus"'
    assert fhir.parse_data_uri_json(None) is None
