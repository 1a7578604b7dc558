"""Incremental processing-log semantics (SURVEY §2.10)."""

from __future__ import annotations

from id3c_spark.sources.store import ParquetTable
from id3c_spark.streaming.incremental import run_incremental


def test_incremental_idempotent(spark, tmp_path):
    receiving = spark.createDataFrame(
        [(i, f'{{"n": {i}}}') for i in range(10)], "id long, document string"
    )
    status = ParquetTable(spark, str(tmp_path / "status"))
    seen_batches = []

    def transform(batch):
        seen_batches.append(batch.count())

    # first run processes everything
    s1 = run_incremental(spark, receiving, status, "enrollment", "etl1", 1, transform)
    assert s1.processed == 10
    # second run: nothing new
    s2 = run_incremental(spark, receiving, status, "enrollment", "etl1", 1, transform)
    assert s2.processed == 0
    # revision bump → full reprocess (backfill parity)
    s3 = run_incremental(spark, receiving, status, "enrollment", "etl1", 2, transform)
    assert s3.processed == 10
    # a different etl name has its own offsets
    s4 = run_incremental(spark, receiving, status, "enrollment", "etl2", 1, transform)
    assert s4.processed == 10
    assert seen_batches == [10, 10, 10]


def test_new_rows_only(spark, tmp_path):
    status = ParquetTable(spark, str(tmp_path / "status"))
    r1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, document string")
    run_incremental(spark, r1, status, "manifest", "etl", 1, lambda b: None)
    r2 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, document string")
    s = run_incremental(spark, r2, status, "manifest", "etl", 1, lambda b: None)
    assert s.processed == 1


def test_store_atomic_publish(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    t.publish(spark.createDataFrame([(1,)], "x long"))
    assert t.read().count() == 1
    t.append(spark.createDataFrame([(2,)], "x long"))
    assert t.read().count() == 2
    assert t.current_version() == 2


def test_store_time_travel_and_retention(spark, tmp_path):
    from id3c_spark.sources.store import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "tt"), keep_versions=10)
    for v in range(1, 4):
        t.publish(spark.createDataFrame([(v,)], "x long"))
    assert t.versions() == [1, 2, 3]
    assert t.read().collect()[0]["x"] == 3
    # pin the snapshot a training run consumed
    assert t.read(version=1).collect()[0]["x"] == 1
    # default retention vacuums old versions and says so when asked
    s = ParquetTable(spark, str(tmp_path / "s"))
    for v in range(1, 4):
        s.publish(spark.createDataFrame([(v,)], "x long"))
    assert s.versions() == [2, 3]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="keep_versions"):
        s.read(version=1)


def test_store_compact_and_evolve(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from id3c_spark.sources.store import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "tbl"), keep_versions=5)
    t.publish(spark.range(0, 100).repartition(16).select("id"))
    t.append(spark.range(100, 120).repartition(8).select("id"))
    v_files = glob.glob(f"{t.path}/v{t.current_version()}/*.parquet")
    assert len(v_files) > 2

    v = t.compact(target_files=2)
    files = glob.glob(f"{t.path}/v{v}/*.parquet")
    assert len(files) <= 2
    assert t.read().count() == 120
    assert set(r["id"] for r in t.read().collect()) == set(range(120))

    # additive schema evolution: new column arrives → old rows get NULL
    evolved = spark.range(120, 125).select(
        "id", F.lit("fresh").alias("source")
    )
    t.append(evolved, evolve=True)
    out = t.read()
    assert set(out.columns) == {"id", "source"}
    assert out.filter(F.col("source").isNull()).count() == 120
    assert out.filter(F.col("source") == "fresh").count() == 5
    # and a producer still on the OLD schema keeps working
    t.append(spark.range(125, 126).select("id"), evolve=True)
    assert t.read().count() == 126
