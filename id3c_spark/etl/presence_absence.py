"""Presence-absence ETL (reference: lib/id3c/cli/command/etl/presence_absence.py).

Document shape (Samplify): {"samples": [{investigatorId, sampleId, chip,
sampleFailed, targetResults: [{geneTarget, controlStatus, targetStatus,
wellResults: [...]}], ...}]}.

The reference loops records in Python; here the whole batch is ONE plan:

  parse (from_json) → explode samples → explode targetResults →
  validate/split (skips mirror reference skip rules) →
  staged target / sample / presence_absence frames → MERGEs.

Skip rules carried over:
  - old-format documents {"store": ...} skipped (presence_absence.py:101-106)
  - samples without investigatorId barcode skipped (no identifier to match)
  - sampleFailed=true skipped (failed assay)
  - targetStatus in Fail/Review skipped (presence_absence.py:409-452):
    only Detected/Positive → true, NotDetected/Negative → false,
    Indeterminate → null survive (`target_present` mapping)

presence_absence.identifier = '{sampleId}/{geneTarget}' + optional
'/{chip}' — the reference builds 'NWGC/{id}' strings in Python
(presence_absence.py:205-208); re-tests of the same identifier are
corrections and overwrite (presence_absence.py:210-213).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from id3c_spark.etl.warehouse import Warehouse

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("store", T.StringType()),            # old format marker
    T.StructField("samples", T.ArrayType(T.StructType([
        T.StructField("investigatorId", T.StringType()),
        T.StructField("sampleId", T.LongType()),
        T.StructField("chip", T.StringType()),
        T.StructField("sampleFailed", T.BooleanType()),
        T.StructField("extractionDate", T.StringType()),
        T.StructField("assayName", T.StringType()),
        T.StructField("assayDate", T.StringType()),
        T.StructField("targetResults", T.ArrayType(T.StructType([
            T.StructField("geneTarget", T.StringType()),
            T.StructField("controlStatus", T.StringType()),
            T.StructField("targetStatus", T.StringType()),
        ]))),
    ]))),
])

ETL_NAME = "presence-absence"
REVISION = 1


def target_present(status: Column) -> Column:
    """targetStatus → three-state present (presence_absence.py:409-452)."""
    return (
        F.when(status.isin("Detected", "Positive"), F.lit(True))
        .when(status.isin("NotDetected", "Negative"), F.lit(False))
        .when(status == "Indeterminate", F.lit(None).cast("boolean"))
    )


def parse_results(receiving: DataFrame) -> DataFrame:
    """receiving(id, document) → one row per (sample, targetResult) with
    validity flags; all skips are data, not control flow."""
    parsed = receiving.select(
        "id", F.from_json("document", DOCUMENT_SCHEMA).alias("doc")
    )
    samples = (
        parsed.filter(F.col("doc.store").isNull())          # old format → skip
        .select("id", F.explode("doc.samples").alias("s"))
    )
    return (
        samples.filter(F.col("s.investigatorId").isNotNull())
        .filter(~F.coalesce(F.col("s.sampleFailed"), F.lit(False)))
        .select(
            "id",
            F.lower("s.investigatorId").alias("barcode"),   # citext
            F.col("s.sampleId").alias("nwgc_id"),
            F.col("s.chip").alias("chip"),
            F.explode("s.targetResults").alias("tr"),
        )
        .select(
            "id", "barcode", "nwgc_id", "chip",
            F.col("tr.geneTarget").alias("gene_target"),
            (F.col("tr.controlStatus") == "PositiveControl").alias("is_control"),
            F.col("tr.targetStatus").alias("target_status"),
        )
        .filter(~F.col("target_status").isin("Fail", "Review"))
    )


def run(
    spark: SparkSession,
    receiving: DataFrame,
    warehouse: Warehouse,
    identifiers: DataFrame,
) -> dict[str, int]:
    """One batch run. ``identifiers`` = warehouse.identifier frame
    (uuid, barcode, identifier_set_id) for barcode→sample resolution; rows
    whose barcode is unknown are skipped with a warning count (the
    reference warns and skips unknown barcodes)."""
    results = parse_results(receiving).cache()

    known = results.join(
        F.broadcast(identifiers.select(F.lower("barcode").alias("barcode"), "uuid")),
        "barcode",
        "inner",
    ).cache()
    n_unknown = results.count() - known.count()

    # 1. targets: find-or-create by identifier (gene target)
    wanted_targets = (
        known.groupBy(F.col("gene_target").alias("identifier"))
        .agg(F.max("is_control").alias("control"))
    )
    targets = warehouse.find_or_create_target(wanted_targets)

    # 2. samples: upsert by identifier (= barcode uuid), keep latest nwgc id
    w = Window.partitionBy("uuid").orderBy(F.desc("id"))
    sample_updates = (
        known.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("uuid").alias("identifier"),
            F.to_json(F.struct(F.col("nwgc_id").alias("nwgc_id"))).alias("details"),
        )
    )
    samples = warehouse.upsert_sample(sample_updates)

    # 3. presence_absence rows: latest result per (sample, target, chip) wins
    #    (re-tests are corrections, presence_absence.py:210-213)
    pa_identifier = F.concat_ws(
        "/", F.col("nwgc_id").cast("string"), F.col("gene_target"), F.coalesce("chip", F.lit(""))
    )
    w2 = Window.partitionBy("barcode", "gene_target", "chip").orderBy(F.desc("id"))
    pa_updates = (
        known.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .join(samples.select(F.col("identifier").alias("uuid"), "sample_id"), "uuid")
        .join(
            F.broadcast(targets.select(F.col("identifier").alias("gene_target"), "target_id")),
            "gene_target",
        )
        .select(
            pa_identifier.alias("identifier"),
            "sample_id",
            "target_id",
            target_present(F.col("target_status")).alias("present"),
            F.to_json(F.struct(F.col("target_status").alias("status"))).alias("details"),
        )
    )
    pa = warehouse.upsert_presence_absence(pa_updates)

    stats = {
        "results": results.count(),
        "unknown_barcodes": n_unknown,
        "targets": targets.count(),
        "samples": samples.count(),
        "presence_absence": pa.count(),
    }
    results.unpersist()
    known.unpersist()
    return stats
