"""Warehouse table bundle: typed upsert wrappers over operators.merge.

Each method mirrors one reference upsert (citations inline). Tables are
ParquetTable stores (Delta-MERGE stand-in, see sources/store.py); all
write paths are full plans — no per-row loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from id3c_spark import schemas
from id3c_spark.operators.merge import find_or_create, merge
from id3c_spark.sources.store import ParquetTable


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.tables: dict[str, ParquetTable] = {
            name: ParquetTable(spark, os.path.join(root, name))
            for name in schemas.WAREHOUSE_SCHEMAS
        }

    def read(self, name: str) -> DataFrame:
        tbl = self.tables[name]
        if tbl.exists():
            return tbl.read()
        return self.spark.createDataFrame([], schemas.WAREHOUSE_SCHEMAS[name])

    def publish(self, name: str, df: DataFrame) -> None:
        self.tables[name].publish(df)

    # --- reference upsert family (SURVEY §2.9) ---------------------------

    def find_or_create_target(self, wanted: DataFrame) -> DataFrame:
        """find_or_create_target (etl/__init__.py:652-682): insert missing
        (identifier, control); never update existing."""
        res = find_or_create(self.read("target"), wanted, ["identifier"], "target_id")
        self.publish("target", res.df)
        return self.read("target")

    def find_or_create_site(self, wanted: DataFrame) -> DataFrame:
        """find_or_create_site (etl/__init__.py:33-63); site identifiers are
        unique case-insensitively (site.sql:12-14) — normalize before match."""
        current = self.read("site")
        res = find_or_create(
            current.withColumn("identifier", F.col("identifier")),
            wanted, ["identifier"], "site_id",
        )
        self.publish("site", res.df)
        return self.read("site")

    def upsert_individual(self, updates: DataFrame) -> DataFrame:
        """upsert_individual (etl/__init__.py:66-140): match identifier,
        update sex, merge details."""
        res = merge(
            self.read("individual"), updates, ["identifier"], "individual_id",
            update_cols=["sex"],
        )
        self.publish("individual", res.df)
        return self.read("individual")

    def upsert_encounter(self, updates: DataFrame) -> DataFrame:
        """upsert_encounter (etl/__init__.py:143-249): match identifier."""
        res = merge(
            self.read("encounter"), updates, ["identifier"], "encounter_id",
            update_cols=["individual_id", "site_id", "encountered", "age_months"],
        )
        self.publish("encounter", res.df)
        return self.read("encounter")

    def upsert_sample(self, updates: DataFrame) -> DataFrame:
        """upsert_sample (db/__init__.py:182-326): alternate-key match on
        identifier OR collection_identifier; error on multi-match."""
        res = merge(
            self.read("sample"), updates,
            [["identifier"], ["collection_identifier"]], "sample_id",
            update_cols=["collection_identifier", "encounter_id", "collected", "access_role"],
        )
        self.publish("sample", res.df)
        return self.read("sample")

    def upsert_presence_absence(self, updates: DataFrame) -> DataFrame:
        """upsert_presence_absence (etl/__init__.py:548-649): match
        identifier; re-tests are corrections (present may flip)."""
        res = merge(
            self.read("presence_absence"), updates, ["identifier"], "presence_absence_id",
            update_cols=["sample_id", "target_id", "present"],
        )
        self.publish("presence_absence", res.df)
        return self.read("presence_absence")

    def upsert_location(self, updates: DataFrame) -> DataFrame:
        """upsert_location (etl/__init__.py:378-466): match (scale,
        identifier); hierarchy right-biased concat happens in the caller."""
        res = merge(
            self.read("location"), updates, [["scale", "identifier"]], "location_id",
            update_cols=["hierarchy", "point_wkt", "polygon_wkt", "simplified_polygon_wkt"],
        )
        self.publish("location", res.df)
        return self.read("location")

    def upsert_encounter_location(self, updates: DataFrame) -> DataFrame:
        """upsert_encounter_location (etl/__init__.py:469-545): match
        (encounter_id, relation citext)."""
        current = self.read("encounter_location").withColumn(
            "el_id", F.xxhash64("encounter_id", "relation")  # composite PK surrogate
        )
        res = merge(
            current, updates, [["encounter_id", "relation"]], "el_id",
            update_cols=["location_id"],
        )
        self.publish("encounter_location", res.df.drop("el_id"))
        return self.read("encounter_location")
