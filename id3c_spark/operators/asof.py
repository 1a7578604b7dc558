"""As-of join: for each left row, the most recent right row at-or-before it.

The classic "last quote before each trade" operator. Spark has no native
ASOF JOIN (DuckDB/Pandas do), and the naive formulation — a range join
``l.key = r.key AND r.ts <= l.ts`` + per-left top-1 — explodes to
O(|L| x matches) intermediate rows before the window prunes them.

Spark-first shape used here instead (the scalable one): UNION the two
sides with a side marker, then a single window
``partitionBy(key).orderBy(ts, side, seq)`` with
``last(<right payload>, ignorenulls=True)`` carries each right row's
payload forward to every following left row. Exactly ONE shuffle (the
window), no join blowup, and AQE handles key skew. Rows-between is the
default (unbounded preceding → current row), so the carried value is the
right row with the greatest ``(ts, seq)`` at-or-before the left row —
ties on ts resolve to the largest right seq (deterministic "last wins",
matching a sequential replay).

At 100 TB both sides shuffle once on the join key; pre-bucketing either
side by key lets the exchange be reused. Right payload rides as one
struct column so the window carries a single value regardless of payload
width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_seq: str | None = None,
    payload: list[str] | None = None,
    prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the latest
    right row with ``right.ts <= left.ts`` (``<`` when strict) on the same
    key(s); nulls when no right row precedes.

    right_seq breaks ts ties deterministically (largest wins, i.e. the
    row a sequential replay would have seen last); defaults to right_ts.
    payload defaults to all non-key, non-ts right columns; output columns
    are prefixed with ``prefix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]
    seq = right_seq or right_ts

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.col(seq).alias("__seq"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    # strict (<) ordering: left rows sort BEFORE right rows at equal ts,
    # so a same-instant right row is not yet visible.
    left_side = -1 if strict else 1
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__seq"].dataType).alias("__seq"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = r.select(
        *keys,
        "__ts",
        "__seq",
        "__side",
        "__payload",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    ).unionByName(l.select(
        *keys, "__ts", "__seq", "__side", "__payload",
        *[c for c in left.columns if c not in keys],
    ))

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__seq").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == left_side).select(
        *keys,
        *[c for c in left.columns if c not in keys],
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in payload],
    )
    return out


def asof_lag_us(left_ts: Column, right_ts: Column) -> Column:
    """Elapsed whole microseconds left-minus-right (bigint) — exact integer
    arithmetic, so every engine produces the identical value (a rounded
    seconds double diverges in the last decimal between DuckDB's
    multiply-round and Spark's BigDecimal HALF_UP on ~20% of rows).

    Defensive cast: ``unix_micros`` rejects TIMESTAMP_NTZ, which leaks in
    when a caller reads the driver's timestamp[us] parquet directly; with
    the session TZ pinned UTC the cast is wall-clock-preserving."""
    return F.unix_micros(left_ts.cast("timestamp")) - F.unix_micros(
        right_ts.cast("timestamp")
    )
