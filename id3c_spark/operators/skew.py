"""Explicit skew mitigation — the tools for when AQE's runtime skew-join
split is not available (non-sort-merge plans, aggregations, static-plan
deployments) or when a key is so hot that even split shuffle blocks spill.

Two classics, both pure DataFrame compositions:

  - salted_join      — N-way salt replication: the skewed side gets a
    deterministic salt in [0, salts), the other side is exploded across
    ALL salts, and the join key becomes (key, salt) — one hot key's rows
    spread over *salts* reducers at the cost of replicating the build
    side *salts* times. Correct for inner/left joins on equi-keys.
  - salted_count     — two-stage aggregation: count/sum first on
    (key, salt), then re-aggregate on key. The map-side combine already
    does this for algebraic aggregates; the explicit form exists for
    sketches and collect-style aggregates that do not combine.

At 100 TB the decision rule: AQE first (free), salting when a profiled
hot key exceeds what one task can sort, broadcast when the dim side
simply fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where *skewed*'s hot keys are spread across *salts*
    sub-keys. *other* is replicated `salts`× (keep it the smaller side);
    the result equals ``skewed.join(other, on, how)`` exactly.

    The salt is md5-deterministic per ROW (id-free: derived from the
    whole row hash), so replays are stable and no RNG state is needed.
    """
    assert how in ("inner", "left"), "salting applies to inner/left equi-joins"
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(F.struct(*skewed.columns)), F.lit(salts))
    )
    exploded = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return salted.join(exploded, [on, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame,
    key: str,
    salts: int = 32,
) -> DataFrame:
    """Two-stage count by *key*: partial counts on (key, salt), then a
    final re-aggregate whose input is at most `salts` rows per key —
    bounding any reducer's row count regardless of key skew. Equals
    ``df.groupBy(key).count()`` exactly."""
    partial = (
        df.withColumn(
            "__salt", F.pmod(F.hash(F.struct(*df.columns)), F.lit(salts))
        )
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))


def auto_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    target_rows_per_task: int = 5_000_000,
    max_salts: int = 64,
) -> DataFrame:
    """salted_join with the salt count DERIVED from a hot-key probe
    instead of guessed: one groupBy(key).count top-1 pass (the
    profile.heavy_hitters aggregation) measures the heaviest key, and
    salts = ceil(hot_rows / target_rows_per_task) clamped to
    [1, max_salts]. A balanced table probes to salts=1 and the plan
    collapses to the PLAIN join (zero replication cost); a pathological
    key gets exactly the spread it needs.

    This is the stats-before-strategy step AQE applies to in-flight
    shuffles, applied where AQE can't see: static plans, aggregations
    feeding the join, or hot keys so large a single split task still
    spills. The probe is one map-side-combined agg + a 1-row driver
    scalar — cheap relative to any join worth salting."""
    hot = (
        skewed.groupBy(on)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]["mx"]
    )
    salts = max(1, min(max_salts, -(-int(hot or 0) // target_rows_per_task)))
    if salts == 1:
        return skewed.join(other, on, how)
    return salted_join(skewed, other, on, salts=salts, how=how)
