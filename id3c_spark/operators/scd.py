"""Slowly-changing-dimension type 2 (temporal versioning).

The reference's warehouse keeps only the latest row per entity (upsert
semantics, operators/merge.py); an analytics/training warehouse also
needs *history* — which value was current when — both to reproduce a
past training set and to audit corrections. SCD2 is the standard shape:
one row per (entity, version) with [valid_from, valid_to) intervals,
valid_to NULL for the current version.

Two entry points:
  - scd2_from_changelog: compact an append-only event log into SCD2
    history in one pass (per-key window: keep change points, close each
    with the next change's timestamp). One key-partitioned window — the
    same single shuffle any per-key ordering needs.
  - scd2_apply: merge a new full snapshot into existing history — the
    incremental form. One key-keyed outer join between the CURRENT
    slice and the snapshot; closed historical rows pass through
    untouched (filter, no join), so cost is keyed on the live entity
    count, not history depth.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    events: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, attrs…, valid_from, valid_to) from an append-only log.

    A version starts at each row whose attribute tuple differs from the
    key's previous row (ordered by ts, then *tiebreak_col*); it ends at
    the next version's start (NULL for the current one). Timestamps are
    carried as-is — pass unix-micros longs for engine-exact comparisons.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order])
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        F.lag(attrs).over(w).isNull()
        | ~F.lag(attrs).over(w).eqNullSafe(attrs)
    )
    marked = events.withColumn("__chg", changed)
    # windows over the same (partition, order) spec share one shuffle+sort
    starts = marked.filter(F.col("__chg")).withColumn(
        "valid_to",
        F.lead(F.col(ts_col)).over(
            Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order])
        ),
    )
    return starts.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        "valid_to",
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    as_of,
    close_missing: bool = False,
) -> DataFrame:
    """Merge a full *snapshot* taken at *as_of* into SCD2 *history*.

    - changed entities: current row closed at as_of + a new open row
    - new entities: new open row
    - unchanged entities: untouched
    - entities absent from the snapshot: closed at as_of when
      *close_missing* (entity deleted upstream), else left open
    """
    closed = history.filter(F.col("valid_to").isNotNull())
    current = history.filter(F.col("valid_to").isNull())
    snap = snapshot.select(
        F.col(key_col), *[F.col(c).alias(f"__s_{c}") for c in attr_cols]
    )
    # presence flags that survive genuinely-null attributes:
    j = (
        current.withColumn("__in_cur", F.lit(True))
        .join(snap.withColumn("__in_snap", F.lit(True)), key_col, "full_outer")
    )
    same = F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
        F.struct(*[F.col(f"__s_{c}").alias(c) for c in attr_cols])
    )
    in_cur = F.col("__in_cur").eqNullSafe(F.lit(True))
    in_snap = F.col("__in_snap").eqNullSafe(F.lit(True))
    kept_current = j.filter(in_cur & in_snap & same).select(
        key_col, *attr_cols, "valid_from", "valid_to"
    )
    closed_now = j.filter(
        in_cur & ((in_snap & ~same) | (~in_snap & F.lit(close_missing)))
    ).select(
        key_col,
        *attr_cols,
        "valid_from",
        F.lit(as_of).alias("valid_to"),
    )
    opened = j.filter(in_snap & (~in_cur | ~same)).select(
        F.col(key_col),
        *[F.col(f"__s_{c}").alias(c) for c in attr_cols],
        F.lit(as_of).alias("valid_from"),
        F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
    )
    still_open = j.filter(in_cur & ~in_snap & F.lit(not close_missing)).select(
        key_col, *attr_cols, "valid_from", "valid_to"
    )
    return (
        closed.unionByName(kept_current)
        .unionByName(closed_now)
        .unionByName(opened)
        .unionByName(still_open)
    )


def as_of_snapshot(history: DataFrame, at) -> DataFrame:
    """Rows current at time *at*: valid_from <= at < valid_to (open
    intervals qualify). The time-travel read over SCD2 history — a
    pushable scan predicate, no join."""
    return history.filter(
        (F.col("valid_from") <= F.lit(at))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(at)))
    )
