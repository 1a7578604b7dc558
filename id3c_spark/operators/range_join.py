"""Range-containment join — age-bin join parity (SURVEY §2.3).

Reference: ``left join shipping.age_bin_fine_v2 on range @> age``
(shipping/views@2020-01-14b.sql:175-176); bins defined in
shipping/age-bin-v2.sql:16-39 (≤22 rows).

Spark shape: broadcast nested-loop with a non-equi predicate. The bin side
is always tiny, so broadcast is exact and cheap — the fact table streams
through codegen once with zero shuffle. This is the idiomatic replacement
for the reference's GiST range index.

Scale note: at 100 TB the fact side never shuffles; the only cost is the
per-row predicate over ~22 broadcast rows. If a bin table ever grew large,
switch to bucketized equi-join (floor(value / bucket_width)) + refine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_containment_join(
    fact: DataFrame,
    bins: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the bin whose [lo, hi) contains value.

    Null hi = unbounded above (matches intervalrange upper-open null,
    schema/deploy/types/intervalrange.sql). Null values join to no bin
    (left join keeps the row with null bin columns).
    """
    v = fact[value_col]
    cond = (bins[lo_col].isNull() | (v >= bins[lo_col])) & (
        bins[hi_col].isNull() | (v < bins[hi_col])
    )
    return fact.join(F.broadcast(bins), cond, how)
