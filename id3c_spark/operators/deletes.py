"""Bulk delete families + cascading deletion sync (SURVEY §2.9).

Reference: ``delete_*`` functions (lib/id3c/db/__init__.py:329-403 —
``ANY(array)`` bulk deletes returning rowcounts) and the REDCap deletion
sync (lib/id3c/cli/command/redcap_sync.py:144-384): find encounters by
``LIKE ANY``, delete linked encounter_locations / samples' links /
presence_absences, then orphaned individuals and locations.

Spark shape: deletes are anti-joins producing the retained frame (the
caller publishes it — same copy-on-write discipline as MERGE); the
cascade is an ordered sequence of anti-joins, each shuffling only key
columns. Orphan detection is a left_anti against remaining referencers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delete_by_ids(table: DataFrame, ids: DataFrame, id_col: str) -> tuple[DataFrame, int]:
    """DELETE WHERE id = ANY(array) → (retained frame, deleted rowcount)."""
    doomed = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    retained = table.join(doomed, id_col, "left_anti")
    n = table.count() - retained.count()
    return retained, n


def find_encounters_like_any(encounters: DataFrame, patterns: Sequence[str]) -> DataFrame:
    """``encounter.identifier LIKE ANY (array[...])``
    (redcap_sync.py:164-174)."""
    cond = F.lit(False)
    for p in patterns:
        cond = cond | F.col("identifier").like(p)
    return encounters.filter(cond)


def cascade_delete_encounters(
    frames: dict[str, DataFrame], doomed_encounters: DataFrame
) -> tuple[dict[str, DataFrame], dict[str, int]]:
    """redcap_sync deletion cascade: encounters → encounter_locations →
    samples' presence_absences → samples unlinked → orphaned individuals.

    Returns (new frames, per-table deleted counts). Samples are unlinked
    (encounter_id nulled), not deleted — matching redcap_sync, which keeps
    physical samples while removing the encounter context.
    """
    stats: dict[str, int] = {}
    enc_ids = doomed_encounters.select("encounter_id").distinct()

    out = dict(frames)
    out["encounter"], stats["encounter"] = delete_by_ids(
        frames["encounter"], enc_ids, "encounter_id"
    )

    if "encounter_location" in frames:
        out["encounter_location"], stats["encounter_location"] = delete_by_ids(
            frames["encounter_location"], enc_ids, "encounter_id"
        )

    if "sample" in frames:
        linked = frames["sample"].join(enc_ids, "encounter_id", "left_semi")
        if "presence_absence" in frames:
            out["presence_absence"], stats["presence_absence"] = delete_by_ids(
                frames["presence_absence"], linked.select("sample_id"), "sample_id"
            )
        marked = frames["sample"].join(
            enc_ids.withColumn("__doomed", F.lit(True)), "encounter_id", "left"
        )
        out["sample"] = marked.withColumn(
            "encounter_id",
            F.when(F.col("__doomed"), F.lit(None).cast("long")).otherwise(F.col("encounter_id")),
        ).drop("__doomed")
        stats["sample_unlinked"] = linked.count()

    if "individual" in frames:
        referenced = out["encounter"].select("individual_id").distinct()
        out["individual"], stats["individual_orphans"] = delete_by_ids(
            frames["individual"],
            frames["individual"].join(referenced, "individual_id", "left_anti")
            .select("individual_id"),
            "individual_id",
        )
    return out, stats
