"""Sequential event-pattern analytics (funnels, cohort retention).

The reference's encounter pipeline is event-log shaped (receiving →
processing_log progression); these are the standard analytic questions
asked of any such log: *who completed step A then B then C, in order*
(funnel) and *of the users first seen in week W, how many were active
n weeks later* (retention).

Scale shape: every stage is keyed on the user id — one shuffle per
funnel step (aggregate → join back on user), all map-side combined; no
windows over the global log, no self-join fan-out beyond the per-user
key. Retention is two aggregations and one co-keyed join. Both mirror
cleanly into ANSI SQL (correlated min-after-previous chain / first-seen
CTE), so the catalog verifies them against DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS_PER_WEEK = 7 * 24 * 3600 * 1_000_000


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest in-order completion of *steps*.

    Returns (user, ts_0 … ts_{n-1}) — unix micros of the earliest event
    chain where each step strictly follows the previous one — only for
    users who completed every step. This is the strict-order funnel
    (earliest-first greedy chain, the standard funnel semantics: taking
    the earliest feasible timestamp at each step is optimal, so a user
    appears iff ANY in-order chain exists).
    """
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("_ts"),
        F.col(type_col).alias("_type"),
    )
    cur = (
        ev.filter(F.col("_type") == steps[0])
        .groupBy("user")
        .agg(F.min("_ts").alias("ts_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = ev.filter(F.col("_type") == step).select("user", "_ts")
        carried = [f"ts_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, "user")
            .filter(F.col("_ts") > F.col(f"ts_{i - 1}"))
            .groupBy("user", *carried)
            .agg(F.min("_ts").alias(f"ts_{i}"))
        )
    return cur


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week_start_us, week_n, n_users) — classic retention grid.

    cohort = each user's first event time bucketed to exact 7-day
    periods from the epoch; week_n = whole 7-day periods between the
    user's first event and the activity row. Integer micros arithmetic
    throughout (no calendar-week ambiguity between engines).
    """
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("_ts"),
    )
    first = ev.groupBy("user").agg(F.min("_ts").alias("first_ts"))
    return (
        ev.join(first, "user")
        .select(
            (
                F.expr(f"first_ts div {MICROS_PER_WEEK}") * F.lit(MICROS_PER_WEEK)
            ).alias("cohort_us"),
            F.expr(f"(_ts - first_ts) div {MICROS_PER_WEEK}").alias("week_n"),
            "user",
        )
        .groupBy("cohort_us", "week_n")
        .agg(F.count_distinct("user").alias("n_users"))
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_index, step, n_users): how many users reached each funnel
    prefix in order — the conversion report over funnel_steps'
    machinery. Step 0 counts users with the first event; step i counts
    users whose greedy chain extends through step i. Same shuffle
    profile as funnel_steps (one user-keyed agg per step)."""
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("_ts"),
        F.col(type_col).alias("_type"),
    )
    spark = events.sparkSession
    counts = []
    cur = (
        ev.filter(F.col("_type") == steps[0])
        .groupBy("user")
        .agg(F.min("_ts").alias("prev"))
    )
    counts.append(cur.count())
    for step in steps[1:]:
        nxt = ev.filter(F.col("_type") == step).select("user", "_ts")
        cur = (
            cur.join(nxt, "user")
            .filter(F.col("_ts") > F.col("prev"))
            .groupBy("user")
            .agg(F.min("_ts").alias("prev"))
        )
        counts.append(cur.count())
    return spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(zip(steps, counts))],
        "step_index long, step string, n_users long",
    )
