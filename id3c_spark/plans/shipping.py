"""Shipping views — the consumer-facing analytical layer (SURVEY §3.3).

Reference views (schema/deploy/shipping/):
  - presence_absence_result_v1: sample ⋈ presence_absence ⋈ target
    ⟕ organism, filtered target.control = false (views.sql:17-28)
  - incidence_model_observation_v2: encounter ⋈ individual ⋈ site
    ⟕ sample, age-bin range joins, ISO week label, residence-tract
    extraction, lateral JSON response decode (views@2020-01-14b.sql:17-100)
  - observation_with_presence_absence_result: the two joined on sample
  - primary_encounter_location: DISTINCT ON top-1 by relation priority
    (primary-encounter-location.sql:6-15)

Each view is a DataFrame function over warehouse frames; register with
``create_views`` to expose them to spark.sql consumers. Versioned names
(``_v1``) mirror the reference's view-versioning discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from id3c_spark.functions.strings import iso_week_label
from id3c_spark.operators.range_join import range_containment_join
from id3c_spark.operators.topk import distinct_on

# age-bin seed data (shipping/age-bin-v2.sql:16-39, FIXTURES §1.2)
AGE_BIN_FINE_V2 = [
    (0, 1), (1, 6), (6, 12), (12, 24), (24, 36), (36, 48), (48, 60),
    (60, 72), (72, 84), (84, 96), (96, 108), (108, 120), (120, 180),
    (180, 240), (240, 360), (360, 480), (480, 600), (600, 720),
    (720, 840), (840, 960), (960, 1080), (1080, None),
]
AGE_BIN_COARSE_V2 = [(0, 6), (6, 60), (60, 216), (216, 780), (780, None)]


def _bins_df(spark: SparkSession, bins) -> DataFrame:
    return spark.createDataFrame(
        [(lo, hi, f"[{lo},{hi if hi is not None else ''})") for lo, hi in bins],
        "lo_months int, hi_months int, range_label string",
    )


def presence_absence_result_v1(
    sample: DataFrame, presence_absence: DataFrame, target: DataFrame,
    organism: DataFrame | None = None,
) -> DataFrame:
    """views.sql:17-28: non-control results with sample + target context."""
    out = (
        sample.select("sample_id", F.coalesce("identifier", "collection_identifier").alias("sample"))
        .join(presence_absence.select("sample_id", "target_id", "present"), "sample_id")
        .join(
            F.broadcast(target.select("target_id", F.col("identifier").alias("target"), "control")),
            "target_id",
        )
        .filter(~F.col("control"))
        .select("sample", "target", "present")
    )
    if organism is not None:
        # target ⟕ organism by identifier map (views.sql joins organism
        # lineage through target; simplified to identifier equality here)
        out = out.join(
            F.broadcast(organism.select(F.col("lineage").alias("organism"),
                                        F.col("identifiers"))),
            F.expr("identifiers['target'] = target"), "left",
        ).drop("identifiers")
    return out


def primary_encounter_location(
    encounter_location: DataFrame, relations: DataFrame
) -> DataFrame:
    """DISTINCT ON (encounter_id) ORDER BY priority NULLS LAST."""
    joined = encounter_location.join(F.broadcast(relations), "relation", "left")
    return distinct_on(
        joined, ["encounter_id"],
        [F.col("priority").asc_nulls_last(), F.col("relation")],
    ).select("encounter_id", "relation", "location_id")


def incidence_model_observation_v2(
    spark: SparkSession,
    encounter: DataFrame,
    individual: DataFrame,
    site: DataFrame,
    sample: DataFrame,
    encounter_location: DataFrame | None = None,
    location: DataFrame | None = None,
) -> DataFrame:
    """views@2020-01-14b.sql:17-100 re-expressed: star join + ISO week +
    age bins (broadcast range joins) + residence tract."""
    fine = _bins_df(spark, AGE_BIN_FINE_V2).withColumnsRenamed(
        {"range_label": "age_range_fine", "lo_months": "fine_lo", "hi_months": "fine_hi"}
    )
    coarse = _bins_df(spark, AGE_BIN_COARSE_V2).withColumnsRenamed(
        {"range_label": "age_range_coarse", "lo_months": "coarse_lo", "hi_months": "coarse_hi"}
    )

    obs = (
        encounter
        .join(individual.select("individual_id", F.col("identifier").alias("individual"), "sex"), "individual_id")
        .join(F.broadcast(site.select("site_id", F.col("identifier").alias("site"))), "site_id")
        .join(
            sample.select("encounter_id", F.coalesce("identifier", "collection_identifier").alias("sample")),
            "encounter_id", "left",
        )
        .select(
            "encounter_id",
            F.col("identifier").alias("encounter"),
            "individual", "sex", "site",
            iso_week_label(F.col("encountered")).alias("encountered_week"),
            "age_months", "sample",
        )
    )
    obs = range_containment_join(obs, fine, "age_months", "fine_lo", "fine_hi").drop("fine_lo", "fine_hi")
    obs = range_containment_join(obs, coarse, "age_months", "coarse_lo", "coarse_hi").drop("coarse_lo", "coarse_hi")

    if encounter_location is not None and location is not None:
        # residence census tract: hierarchy->'tract' of the residence
        # location (views@2020-01-14b.sql:59-71)
        tract = (
            encounter_location.filter(F.col("relation").isin("residence", "lodging"))
            .join(location.select("location_id", F.element_at("hierarchy", "tract").alias("residence_census_tract")), "location_id")
            .select("encounter_id", "residence_census_tract")
        )
        obs = obs.join(distinct_on(tract, ["encounter_id"], [F.col("residence_census_tract")]), "encounter_id", "left")
    return obs


def observation_with_presence_absence_result_v1(
    observation: DataFrame, pa_result: DataFrame
) -> DataFrame:
    """views@2020-01-14b.sql:232-244: observation ⋈ result USING (sample)."""
    return observation.join(pa_result, "sample")


def create_views(spark: SparkSession, warehouse_frames: dict[str, DataFrame]) -> None:
    """Register the shipping view stack as temp views for SQL consumers."""
    wf = warehouse_frames
    pa = presence_absence_result_v1(wf["sample"], wf["presence_absence"], wf["target"])
    pa.createOrReplaceTempView("presence_absence_result_v1")
    obs = incidence_model_observation_v2(
        spark, wf["encounter"], wf["individual"], wf["site"], wf["sample"],
        wf.get("encounter_location"), wf.get("location"),
    )
    obs.createOrReplaceTempView("incidence_model_observation_v2")
    observation_with_presence_absence_result_v1(obs, pa).createOrReplaceTempView(
        "observation_with_presence_absence_result_v1"
    )
