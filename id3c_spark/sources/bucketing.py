"""Bucketed table layout — shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact-to-fact join (orders x
lineitem, encounter x sample, corpus x signatures) is re-shuffling both
sides on the join key every query. Spark's answer is bucketing: persist
each table hash-partitioned into a fixed number of buckets on the key
(``DataFrameWriter.bucketBy`` + ``sortBy``), and every subsequent
equi-join or aggregation on that key reads co-located buckets with NO
Exchange on either side — the shuffle is paid once at write time and
amortized over every downstream query. This is the warehouse-layout
counterpart of ``corpus.shuffle_shards`` (which orders training output;
this co-locates join keys).

Notes for real clusters (all apply unchanged on local[n]):
  - both sides must be bucketed on the join key with the SAME bucket
    count (or a divisor, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
  - ``sortBy`` additionally removes the sort step of sort-merge join;
  - bucket pruning turns key-equality filters into a scan of 1/N buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist *df* as a parquet-backed table bucketed (and bucket-sorted)
    on *bucket_cols* — the one-time shuffle that makes every later
    join/agg on those columns exchange-free. With *path* the table is
    external (data at the given location), else managed in the session
    warehouse."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)


def executed_plan(df: DataFrame) -> str:
    """Formatted physical plan AFTER execution (AQE-final), for asserting
    layout properties like exchange-freeness."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan. A co-located
    bucketed join must report 0."""
    plan = executed_plan(df)
    return sum(
        line.lstrip("+-* (").startswith("Exchange")
        for line in plan.splitlines()
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet layout (hive-style ``col=value``
    paths). The complement of bucketing: bucketing co-locates high-
    cardinality JOIN keys, partitioning prunes low-cardinality FILTER
    keys (date, source, language) — a selective scan touches only the
    matching directories, turning a 100 TB relation into the few TB the
    predicate names."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def scan_pruning_evidence(df: DataFrame) -> tuple[str, str]:
    """(PartitionFilters, PushedFilters) lines of the scan node — the two
    `.explain` facts that prove a filter prunes directories and reaches
    the parquet reader instead of running post-scan."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()

    def seg(label: str) -> str:
        m = re.search(re.escape(label) + r":\s*\[([^\]]*)\]", plan)
        return m.group(1) if m else ""

    return seg("PartitionFilters"), seg("PushedFilters")


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted parquet layout: ``repartitionByRange`` on
    *cluster_cols* then sort within partitions, so each output file's
    footer min/max statistics on those columns cover a DISJOINT slice of
    the key space. Parquet predicate pushdown then skips whole files and
    row groups whose stats exclude the predicate — the single-dimension
    form of Delta's OPTIMIZE ZORDER, with no table format required.
    Partitioning prunes low-cardinality dirs, bucketing co-locates join
    keys; range clustering is the third layout tool, for selective range
    scans over high-cardinality keys (timestamps, ids, scores)."""
    parts = [F.col(c) for c in cluster_cols]
    rp = (
        df.repartitionByRange(num_files, *parts)
        if num_files
        else df.repartitionByRange(*parts)
    )
    rp.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) footer statistics for *column* — the evidence
    that a layout actually clusters: range-clustered files are pairwise
    disjoint, unclustered files all span the full domain."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for fname in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(fname).metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> "Column":
    """Interleaved-bit (Morton) key over numeric *cols*.

    Delegates to the canonical NULL-safe implementation in
    :func:`id3c_spark.sources.store.zorder_key_expr` (NULLs and
    degenerate constant/empty columns map to bucket 0 instead of
    poisoning the key). Sorting by this key gives the multi-dimensional
    locality range-clustering can't: each output file covers a small
    HYPER-RECTANGLE of the key space, so footer min/max stats skip
    files for predicates on ANY of the clustered columns, not just the
    leading one."""
    from .store import zorder_key_expr

    return zorder_key_expr(df, cols, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet: range-partition + sort on the Morton
    key of *cols* — Delta's OPTIMIZE ZORDER without a table format.
    Use over write_range_clustered when selective predicates hit more
    than one high-cardinality column."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    rp = (
        keyed.repartitionByRange(num_files, "__z")
        if num_files
        else keyed.repartitionByRange("__z")
    )
    rp.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
