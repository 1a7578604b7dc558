"""Declarative data-quality expectations (Deequ/Great-Expectations
shape) — constraint checking as a first-class pipeline gate.

The reference hard-codes its quality gates inline (NOT NULL / CHECK
constraints across schema/deploy/*.sql; barcode presence checks in
etl/manifest.py; NaN-rejecting serialization in lib/id3c/json.py:12-30).
A 100 TB training pipeline needs the same gates, declared once and
evaluated cheaply: every ingest batch answers "how many rows violate
each rule" before anything downstream runs.

Scale shape: all row-local rules (not_null / in_range / in_set /
matches / custom predicate) compile into ONE aggregation pass — a
single scan producing one row of violation counts, unpivoted with a
constant-size projection (the profile_table discipline). `unique`
rules need a distinct count, which rides the same aggregate (one
count_distinct per unique rule); `foreign_key` rules are per-rule
LEFT ANTI joins against the (broadcast) dimension — the only rules
that cost more than the shared scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One expectation: *name* labels the output row; *violations* is a
    row-predicate Column counting TRUE as a violation (row-local rules),
    or None for rules with their own aggregate/join shape."""

    name: str
    violations: Column | None = None
    unique_cols: list[str] = field(default_factory=list)
    fk: tuple[DataFrame, str, str] | None = None  # (dim, local col, dim col)


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def in_set(col: str, allowed: list) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_set({col})", c.isNotNull() & ~c.isin(allowed)
    )


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"matches({col})", c.isNotNull() & ~c.rlike(pattern)
    )


def satisfies(name: str, predicate: Column) -> Rule:
    """Custom rule: rows where *predicate* is NOT true are violations
    (SQL CHECK-constraint semantics: NULL predicate counts as pass)."""
    return Rule(name, ~F.coalesce(predicate, F.lit(True)))


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", unique_cols=list(cols))


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(f"foreign_key({col})", fk=(dim, col, dim_col))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate *rules* → (rule, n_violations) with one row per rule.

    Row-local and unique rules share ONE aggregation over a single scan;
    each foreign-key rule adds one anti-join count (dimension side
    broadcast when small). n_violations for `unique` is the number of
    rows carrying a duplicated key (n_rows − n_distinct_keys counts the
    surplus copies)."""
    aggs = []
    names = []
    for r in rules:
        if r.violations is not None:
            aggs.append(
                F.sum(F.when(r.violations, 1).otherwise(0))
                .cast("long")
                .alias(f"__v{len(names)}")
            )
            names.append(r.name)
        elif r.unique_cols:
            key = (
                F.struct(*[F.col(c) for c in r.unique_cols])
                if len(r.unique_cols) > 1
                else F.col(r.unique_cols[0])
            )
            # count(key) not count(*): SQL UNIQUE exempts NULL keys, and
            # count_distinct ignores them too — both sides must agree
            aggs.append(
                (F.count(key) - F.count_distinct(key))
                .cast("long")
                .alias(f"__v{len(names)}")
            )
            names.append(r.name)
    spark = df.sparkSession
    out = None
    if aggs:
        row = df.agg(*aggs)
        pairs = []
        for i, name in enumerate(names):
            pairs.append(F.struct(F.lit(name).alias("rule"), F.col(f"__v{i}").alias("n_violations")))
        out = row.select(F.explode(F.array(*pairs)).alias("r")).select("r.rule", "r.n_violations")
    for r in rules:
        if r.fk is not None:
            dim, local, dcol = r.fk
            cnt = (
                df.select(F.col(local))
                .filter(F.col(local).isNotNull())
                .join(
                    F.broadcast(dim.select(F.col(dcol).alias(local)).distinct()),
                    local,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .withColumn("rule", F.lit(r.name))
                .select("rule", "n_violations")
            )
            out = cnt if out is None else out.unionByName(cnt)
    if out is None:
        return spark.createDataFrame([], "rule string, n_violations long")
    return out
