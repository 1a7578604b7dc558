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
    """DELETE WHERE id = ANY(array) → (retained frame, deleted rowcount).

    The rowcount is the reference's return contract (db/__init__.py:329-403
    returns ``cursor.rowcount``); it costs ONE action (semi-join count), not
    a count of both the table and the retained frame."""
    doomed = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    retained = table.join(doomed, id_col, "left_anti")
    n = table.join(doomed, id_col, "left_semi").count()
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
    """redcap_sync deletion cascade (redcap_sync.py:144-384), faithfully:

      - encounter + its encounter_location rows are deleted;
      - locations referenced ONLY by doomed encounters are deleted
        (redcap_sync.py:280-293 ``location_id NOT IN (... encounter_id <>
        ...)``);
      - samples linked to a doomed encounter split on provenance
        (redcap_sync.py:326-357): details keys exactly {coding, note} means
        the sample came from REDCap → delete it AND its presence_absence
        rows; anything else keeps lab results — the sample is unlinked
        (encounter_id nulled) and only the REDCap-sourced ``details.note``
        is dropped;
      - individuals unique to the doomed encounters are deleted
        (redcap_sync.py:294-313) — an individual also referenced by a
        surviving encounter, or one never referenced at all, is untouched.

    Returns (new frames, per-table deleted counts).
    """
    from id3c_spark.functions.json_ops import json_remove_keys

    stats: dict[str, int] = {}
    enc_ids = doomed_encounters.select("encounter_id").distinct()

    out = dict(frames)
    out["encounter"], stats["encounter"] = delete_by_ids(
        frames["encounter"], enc_ids, "encounter_id"
    )

    if "encounter_location" in frames:
        el = frames["encounter_location"]
        out["encounter_location"], stats["encounter_location"] = delete_by_ids(
            el, enc_ids, "encounter_id"
        )
        if "location" in frames:
            # locations referenced by doomed encounters and by nothing else
            doomed_locs = (
                el.join(enc_ids, "encounter_id", "left_semi")
                .select("location_id")
                .join(out["encounter_location"].select("location_id"), "location_id", "left_anti")
                .distinct()
            )
            out["location"], stats["location"] = delete_by_ids(
                frames["location"], doomed_locs, "location_id"
            )

    if "sample" in frames:
        sample = frames["sample"]
        # provenance: a sample whose details carry exactly {coding, note}
        # exists only because of REDCap (redcap_sync.py:326-331)
        redcap_provenance = F.array_sort(F.json_object_keys(F.col("details"))).eqNullSafe(
            F.array(F.lit("coding"), F.lit("note"))
        ) if "details" in sample.columns else F.lit(False)
        linked = sample.join(enc_ids, "encounter_id", "left_semi")
        doomed_samples = linked.filter(redcap_provenance).select("sample_id")
        if "presence_absence" in frames:
            out["presence_absence"], stats["presence_absence"] = delete_by_ids(
                frames["presence_absence"], doomed_samples, "sample_id"
            )
        retained_samples, stats["sample"] = delete_by_ids(sample, doomed_samples, "sample_id")
        marked = retained_samples.join(
            enc_ids.withColumn("__doomed", F.lit(True)), "encounter_id", "left"
        )
        unlink = F.col("__doomed").isNotNull()
        # split so the json_remove_keys pandas UDF only ever sees the
        # unlinked rows — untouched samples stay entirely JVM-side
        keep = marked.filter(~unlink).drop("__doomed")
        unlinked = marked.filter(unlink).withColumn(
            "encounter_id", F.lit(None).cast("long")
        )
        if "details" in sample.columns:
            unlinked = unlinked.withColumn(
                "details", json_remove_keys(F.col("details"), ["note"])
            )
        unlinked = unlinked.drop("__doomed")
        out["sample"] = keep.unionByName(unlinked)
        stats["sample_unlinked"] = unlinked.count()

    if "individual" in frames:
        # individuals referenced by doomed encounters and no surviving ones
        doomed_indiv = (
            doomed_encounters.select("individual_id")
            .join(out["encounter"].select("individual_id"), "individual_id", "left_anti")
            .distinct()
        )
        out["individual"], stats["individual_orphans"] = delete_by_ids(
            frames["individual"], doomed_indiv, "individual_id"
        )
    return out, stats
