"""REDCap DET framework (reference: lib/id3c/cli/command/etl/redcap_det.py).

DET (data-entry-trigger) documents land in receiving.redcap_det; an ETL
instance is registered per (redcap_url, project_id) via the
``command_for_project`` decorator (redcap_det.py:34-233). Processing:

  1. select DETs for the project: ``document::jsonb @> {"redcap_url":...,
     "project_id":...}`` + batch cap (redcap_det.py:119-135);
  2. completeness gate: ``{instrument}_complete`` in ('2','Complete')
     → else skipped (redcap_det.py:254-261);
  3. FIFO dedup: first complete DET per record wins
     (redcap_det.py:143-175) — row_number over (record order by id);
  4. fetch records from the REDCap API in batches (driver-side adapter,
     pluggable/fakeable) and hand them to the project transform.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from id3c_spark.functions.json_ops import json_contains_struct

PROJECT_REGISTRY: dict[tuple[str, str], Callable] = {}


def command_for_project(redcap_url: str, project_id: str | int):
    """Plugin decorator registering a transform for one REDCap project
    (redcap_det.py:34-66 parity)."""
    def wrap(fn: Callable) -> Callable:
        PROJECT_REGISTRY[(redcap_url, str(project_id))] = fn
        return fn
    return wrap


def select_dets(
    receiving: DataFrame,
    redcap_url: str,
    project_id: str | int,
    limit: int | None = None,
) -> DataFrame:
    """Project containment filter + optional batch cap (FIFO by id)."""
    dets = receiving.filter(
        json_contains_struct(
            F.col("document"),
            {"redcap_url": redcap_url, "project_id": str(project_id)},
        )
    )
    dets = dets.orderBy("id")
    return dets.limit(limit) if limit else dets


def complete_dets(dets: DataFrame) -> DataFrame:
    """Completeness gate + first-complete-DET-per-record.

    instrument name varies per row; the completeness flag lives at
    ``$.{instrument}_complete`` — resolved dynamically with a second
    get_json_object on the concatenated path.
    """
    instrument = F.get_json_object("document", "$.instrument")
    record = F.get_json_object("document", "$.record")
    doc = F.col("document")
    complete_flag = F.expr(
        "get_json_object(document, concat('$.', get_json_object(document, '$.instrument'), '_complete'))"
    )
    gated = (
        dets.withColumn("record", record)
        .withColumn("instrument", instrument)
        .withColumn("complete", complete_flag.isin("2", "Complete"))
        .filter(F.col("complete"))
    )
    w = Window.partitionBy("record").orderBy("id")
    return gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


@dataclass
class FakeRedcapApi:
    """Driver-side REDCap adapter stand-in (lib/id3c/cli/redcap.py).
    Real deployments swap in an HTTP client; batching contract identical
    (default 5000 records/batch, redcap_det.py:88-93)."""

    records: dict[str, dict]
    batch_size: int = 5000
    calls: int = 0

    def fetch(self, record_ids: Sequence[str]) -> list[dict]:
        out = []
        for i in range(0, len(record_ids), self.batch_size):
            self.calls += 1
            out.extend(
                self.records[r] for r in record_ids[i:i + self.batch_size] if r in self.records
            )
        return out


def run(
    spark: SparkSession,
    receiving: DataFrame,
    redcap_url: str,
    project_id: str | int,
    api: FakeRedcapApi,
    limit: int | None = None,
) -> dict:
    """One DET batch: select → gate/dedup → fetch → project transform."""
    transform = PROJECT_REGISTRY.get((redcap_url, str(project_id)))
    if transform is None:
        raise KeyError(f"no ETL registered for {redcap_url} project {project_id}")
    dets = select_dets(receiving, redcap_url, project_id, limit)
    winners = complete_dets(dets)
    record_ids = [r.record for r in winners.select("record").orderBy("record").collect()]
    fetched = api.fetch(record_ids)
    result = transform(spark, fetched)
    return {
        "dets": dets.count(),
        "complete_records": len(record_ids),
        "fetched": len(fetched),
        "api_calls": api.calls,
        "transform_result": result,
    }
