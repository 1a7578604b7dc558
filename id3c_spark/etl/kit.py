"""Kit ETL (reference: lib/id3c/cli/command/etl/kit.py).

Kits link an at-home test kit barcode to an encounter and to rdt/utm
sample slots (kit.py:152-228, 381-539). The ordering hazard: a kit
document can arrive before its enrollment — the reference *raises*
``EncounterNotFoundError`` so the record retries on the next run
(kit.py:70-77, 279-287).

Spark shape: the batch splits into ready (encounter exists) and deferred
(no encounter yet). Ready rows MERGE into ``kit``; deferred rows are
returned so the incremental layer leaves them unmarked — they re-enter the
next batch, which is the retry-on-next-trigger design SURVEY §7.3 item 7
calls for, without any exception control flow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from id3c_spark.etl.warehouse import Warehouse
from id3c_spark.operators.merge import merge

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("kit", T.StringType()),                # kit barcode
    T.StructField("encounter", T.StringType()),          # encounter identifier
    T.StructField("rdt_sample", T.StringType()),         # sample barcode
    T.StructField("utm_sample", T.StringType()),
])


@dataclass
class KitRunResult:
    stats: dict
    deferred_ids: DataFrame   # receiving ids whose encounter is missing


def run(
    spark: SparkSession,
    receiving: DataFrame,
    warehouse: Warehouse,
    identifiers: DataFrame,
) -> KitRunResult:
    docs = receiving.select("id", F.from_json("document", DOCUMENT_SCHEMA).alias("d")).select(
        "id",
        F.lower("d.kit").alias("kit_barcode"),
        F.col("d.encounter").alias("encounter_identifier"),
        F.lower("d.rdt_sample").alias("rdt_barcode"),
        F.lower("d.utm_sample").alias("utm_barcode"),
    ).filter(F.col("kit_barcode").isNotNull())

    encounters = warehouse.read("encounter").select(
        F.col("identifier").alias("encounter_identifier"), "encounter_id"
    )
    ready = docs.join(encounters, "encounter_identifier", "inner")
    deferred = docs.join(encounters, "encounter_identifier", "left_anti")

    ids = F.broadcast(identifiers.select(F.lower("barcode").alias("barcode"), "uuid"))
    samples = warehouse.read("sample").select(F.col("identifier").alias("uuid"), "sample_id")

    def sample_slot(df: DataFrame, barcode_col: str, out: str) -> DataFrame:
        return (
            df.join(ids.withColumnsRenamed({"barcode": barcode_col}), barcode_col, "left")
            .join(samples, "uuid", "left")
            .withColumnsRenamed({"sample_id": out})
            .drop("uuid")
        )

    staged = sample_slot(sample_slot(ready, "rdt_barcode", "rdt_sample_id"),
                         "utm_barcode", "utm_sample_id")
    kit_updates = (
        staged.join(ids.withColumnsRenamed({"barcode": "kit_barcode"}), "kit_barcode", "inner")
        .select(
            F.col("uuid").alias("identifier"),
            "encounter_id", "rdt_sample_id", "utm_sample_id",
        )
        .dropDuplicates(["identifier"])
    )
    merged = merge(
        warehouse.read("kit"), kit_updates, [["identifier"]], "kit_id",
        update_cols=["encounter_id", "rdt_sample_id", "utm_sample_id"], details_col=None,
    )
    warehouse.publish("kit", merged.df)

    return KitRunResult(
        stats={
            "kits_seen": docs.count(),
            "ready": ready.count(),
            "deferred": deferred.count(),
            "kits": warehouse.read("kit").count(),
        },
        deferred_ids=deferred.select("id"),
    )
