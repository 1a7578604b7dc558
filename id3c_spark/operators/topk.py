"""Top-1 / top-k per group — Postgres ``DISTINCT ON`` parity (SURVEY §2.5).

Reference: ``select distinct on (encounter_id) ... order by encounter_id,
priority nulls last`` (schema/deploy/warehouse/primary-encounter-location.sql:6-15).

Spark shape: row_number over a window. At scale this is a single hash
shuffle on the partition keys; no global sort. For heavily skewed keys AQE
splits the hot partitions (enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
) -> DataFrame:
    """First k rows per key group under ``order_by`` (ties deterministic
    only if order_by is total — pass a unique tiebreaker column last,
    exactly as the reference orders by priority *and* relies on insert
    order; we make the tiebreak explicit instead)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k).drop("__rn")
    return out
