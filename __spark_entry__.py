"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship star-join query at sf0.001 (smoke).
queries()      — full catalog from id3c_spark.plans.queries (SURVEY §2).
oracle_sql()   — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from id3c_spark.plans.queries import all_oracles, all_queries


def _prepare(spark: SparkSession) -> None:
    """Session settings the catalog depends on, applied defensively in case
    the driver built its own SparkSession: nanos timestamps read as long
    (for fixture vintages using TIMESTAMP(NANOS); the loader also
    normalizes TIMESTAMP_NTZ vintages — see plans/queries.py t()), UTC
    semantics, hstore-style right-biased map concat."""
    for k, v in {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
        "spark.sql.adaptive.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    return all_queries()["revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    catalog = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in catalog.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted entries (approximate /
    non-SQL-expressible operators) get the driver's rows-only check."""
    return all_oracles()
