"""Enrollment ETL (reference: lib/id3c/cli/command/etl/enrollments.py).

Audere enrollment documents (schemaVersion 1.0.0/1.1.0, FIXTURES §2.2):
{id, schemaVersion, participant, startTimestamp, site{name,type},
 age{value, ninetyOrAbove}, locations[{use, region}],
 sampleCodes[{type, code}], responses[{question{token},
 answer{type, chosenOptions|value}, options[{token}]}]}.

Reference flow per record: assert known schemaVersion
(enrollments.py:89-92), upsert individual (sex from AssignedSex
response), find-or-create site, upsert encounter (age capped at 90y,
etl/__init__.py:313-329), skeletal samples from sampleCodes
(enrollments.py:125-135), locations by use. Here: one plan per entity,
`decode_answer` (enrollments.py:370-399) as a when/otherwise expression
over the parsed responses array — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from id3c_spark.etl.warehouse import Warehouse

KNOWN_VERSIONS = {"1.0.0", "1.1.0"}   # enrollments.py:89-92
AGE_CAP_MONTHS = 90 * 12              # min(ceil(age), 90) etl/__init__.py:313-329

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("schemaVersion", T.StringType()),
    T.StructField("participant", T.StringType()),
    T.StructField("startTimestamp", T.StringType()),
    T.StructField("site", T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
    ])),
    T.StructField("age", T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("ninetyOrAbove", T.BooleanType()),
    ])),
    T.StructField("locations", T.ArrayType(T.StructType([
        T.StructField("use", T.StringType()),
        T.StructField("region", T.StringType()),
    ]))),
    T.StructField("sampleCodes", T.ArrayType(T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("code", T.StringType()),
    ]))),
    T.StructField("responses", T.ArrayType(T.StructType([
        T.StructField("question", T.StructType([T.StructField("token", T.StringType())])),
        T.StructField("answer", T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("chosenOptions", T.ArrayType(T.IntegerType())),
            T.StructField("value", T.DoubleType()),
        ])),
        T.StructField("options", T.ArrayType(T.StructType([T.StructField("token", T.StringType())]))),
    ]))),
])

SAMPLE_CODE_TYPES = {"ClinicSwab": "collection", "ScannedSelfSwab": "collection"}


def decode_option_answer(responses: Column, token: str) -> Column:
    """First chosen-option token for question ``token`` — decode_answer
    parity (enrollments.py:370-399) as a pure expression: find the
    response, index its options by chosenOptions[0]."""
    resp = F.get(F.filter(responses, lambda r: r["question"]["token"] == F.lit(token)), 0)
    return F.when(
        resp["answer"]["type"] == "Option",
        F.get(resp["options"],
              F.coalesce(F.get(resp["answer"]["chosenOptions"], 0), F.lit(0)))["token"],
    )


def parse(receiving: DataFrame) -> DataFrame:
    parsed = receiving.select("id", F.from_json("document", DOCUMENT_SCHEMA).alias("d"))
    known = parsed.filter(F.col("d.schemaVersion").isin(*KNOWN_VERSIONS))
    age_months = F.least(
        F.when(
            F.coalesce(F.col("d.age.ninetyOrAbove"), F.lit(False)), F.lit(AGE_CAP_MONTHS)
        ).otherwise(F.floor(F.col("d.age.value") * 12).cast("int")),
        F.lit(AGE_CAP_MONTHS),
    )
    return known.select(
        "id",
        F.col("d.id").alias("encounter_identifier"),
        F.col("d.participant").alias("individual_identifier"),
        F.to_timestamp("d.startTimestamp").alias("encountered"),
        F.lower("d.site.name").alias("site_identifier"),
        F.col("d.site.type").alias("site_type"),
        age_months.cast("int").alias("age_months"),
        decode_option_answer(F.col("d.responses"), "AssignedSex").alias("sex"),
        F.col("d.locations").alias("locations"),
        F.col("d.sampleCodes").alias("sample_codes"),
        F.to_json(F.struct(F.col("d.responses").alias("responses"))).alias("details"),
    )


def run(
    spark: SparkSession,
    receiving: DataFrame,
    warehouse: Warehouse,
    identifiers: DataFrame | None = None,
) -> dict[str, int]:
    """``identifiers`` (uuid, barcode): when provided, sampleCodes resolve
    barcode → uuid before storage (find_identifier parity,
    db/__init__.py:79-101) and unknown barcodes are skipped."""
    enr = parse(receiving).cache()

    sites = warehouse.find_or_create_site(
        enr.select(
            F.col("site_identifier").alias("identifier"),
            F.to_json(F.struct(F.col("site_type").alias("type"))).alias("details"),
        ).dropDuplicates(["identifier"])
    )

    individuals = warehouse.upsert_individual(
        enr.select(
            F.col("individual_identifier").alias("identifier"),
            F.col("sex"),
            F.lit(None).cast("string").alias("details"),
        ).dropDuplicates(["identifier"])
    )

    encounters = warehouse.upsert_encounter(
        enr.join(
            F.broadcast(sites.select(F.col("identifier").alias("site_identifier"), "site_id")),
            "site_identifier",
        )
        .join(
            individuals.select(
                F.col("identifier").alias("individual_identifier"), "individual_id"
            ),
            "individual_identifier",
        )
        .select(
            F.col("encounter_identifier").alias("identifier"),
            "individual_id", "site_id", "encountered", "age_months", "details",
        )
        .dropDuplicates(["identifier"])
    )

    # skeletal samples: collection identifier only (enrollments.py:125-135)
    codes = (
        enr.select("encounter_identifier", F.explode("sample_codes").alias("sc"))
        .filter(F.col("sc.type").isin(*SAMPLE_CODE_TYPES))
        .join(
            encounters.select(F.col("identifier").alias("encounter_identifier"), "encounter_id"),
            "encounter_identifier",
        )
        .select("encounter_id", F.lower("sc.code").alias("barcode"))
    )
    if identifiers is not None:
        codes = codes.join(
            F.broadcast(identifiers.select(F.lower("barcode").alias("barcode"), "uuid")),
            "barcode",
        ).select("encounter_id", F.col("uuid").alias("collection_identifier"))
    else:
        codes = codes.select("encounter_id", F.col("barcode").alias("collection_identifier"))
    samples = warehouse.upsert_sample(
        codes.select(
            F.lit(None).cast("string").alias("identifier"),
            "collection_identifier",
            "encounter_id",
        ).dropDuplicates(["collection_identifier"])
    )

    stats = {
        "enrollments": enr.count(),
        "sites": sites.count(),
        "individuals": individuals.count(),
        "encounters": encounters.count(),
        "samples": samples.count(),
    }
    enr.unpersist()
    return stats
