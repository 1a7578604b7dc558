"""Interval overlap join — the two-sided generalization of
range_containment_join (which joins points into broadcastable bins;
reference analogue: the age-bin join of shipping views). Overlap joins
show up wherever both sides carry durations: encounter stays × exposure
windows, session spans × campaign windows, genomic reads × annotation
regions.

Scale shape (bucketized blocking, the Sedona/interval-tree-free way):
each interval explodes to the fixed-width buckets it covers, the join
is a plain EQUI-join on the bucket id (shuffle keyed on bucket — AQE
skew-splittable), and each qualifying pair is attributed to exactly ONE
bucket — the bucket containing max(start_l, start_r) — so no
post-join distinct pass is needed. Replication factor is
len(interval)/bucket_width + 1 per row; pick bucket_width near the
typical interval length (docstring of overlap_join). Neither side is
broadcast or collected — both can be 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _buckets(start: str, end: str, width: int):
    # half-open [start, end): last covered bucket is (end-1) div width
    return F.sequence(
        F.expr(f"{start} div {width}"), F.expr(f"({end} - 1) div {width}")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_width: int,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
) -> DataFrame:
    """All (left row, right row) pairs whose half-open integer intervals
    [l_start, l_end) and [r_start, r_end) overlap.

    Exact for any bucket_width ≥ 1; width only tunes replication (cost
    ≈ Σ len/width + 1 exploded rows per side). Column name collisions
    between the two inputs must be resolved by the caller (the interval
    bound columns themselves may be named identically — they are
    referenced side-by-side after the join via the DataFrame handles).
    """
    lb = left.withColumn("__bkt", F.explode(_buckets(l_start, l_end, bucket_width)))
    rb = right.withColumn("__bkt", F.explode(_buckets(r_start, r_end, bucket_width)))
    joined = lb.join(rb, "__bkt")
    overlap = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    # one-bucket attribution: the pair is kept only in the bucket that
    # contains the later of the two starts — exactly one per pair
    anchor = F.expr(f"greatest({l_start}, {r_start}) div {bucket_width}")
    return (
        joined.filter(overlap)
        .filter(F.col("__bkt") == anchor)
        .drop("__bkt")
    )
