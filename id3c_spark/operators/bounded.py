"""Bounded single-wave collect — the shared probe primitive.

Several operators make a regime decision or build a local model from a
relation they can PROVE is small (dedup_clusters' edge probe, kmv_jaccard's
k·|groups| sketch). The naive ``df.limit(cap + 1).collect()`` is bounded
but executes via ``executeTake``'s partition ramp (1 partition, then ×4
per wave): on a filtered relation far below the cap every partition must
be scanned anyway, so the extra waves are pure scheduler overhead
(measured 1.5–5 s per probe at sf0.1).  r12 worked around the ramp by
temporarily raising ``spark.sql.limit.initialNumPartitions`` — a
session-global conf mutation a concurrent same-session limit query could
inherit (ADVICE r12).

``bounded_collect`` replaces both shapes with a per-plan mechanism: an
Arrow ``mapInPandas`` stage that emits at most ``cap + 1`` rows PER
PARTITION (early-exiting the batch iterator, so a huge partition stops
decoding past the cap), collected by one ordinary single-wave job.  No
session conf is touched, so nothing can leak across queries.

Bounds and detection semantics:

  - if the TRUE row count ≤ cap, no partition can hit the per-partition
    cap, so the collected list is provably COMPLETE;
  - if rows were dropped anywhere, the dropping site alone contributed
    cap + 1 rows, so ``len(result) > cap`` still holds — overflow is
    always detected, never masked.

Driver-transfer bound (ADVICE r13): the direct single-stage collect
ships worst-case ``partitions × (cap + 1)`` rows to the driver — fine
for the probe-sized caps it was built for, but a large cap on a
many-partition relation (kmv_jaccard's 4 M-row sketch guard over ~200
shuffle partitions) could OOM the driver BEFORE the caller's overflow
check runs.  When that worst case exceeds ``direct_budget_rows`` the
collect routes through one extra tiny stage: ``repartition(1)`` over
the already-capped rows, then the same per-partition cap again — the
single downstream task's Arrow reader early-exits after ``cap + 1``
rows (shuffle fetch is pull-based, so it never materializes the other
blocks), and the driver receives at most ``cap + 1`` rows no matter how
many partitions overflowed.  Executor-side shuffle write stays bounded
at ``partitions × (cap + 1)`` rows — distributed, spillable, and only
paid in the overflow regime the caller is about to error on anyway.
The budget keeps the common probe case (small cap, ≤ a few dozen
partitions) on the original one-stage path so regime probes stay as
fast as r13 measured them.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, Row

#: Worst-case direct-collect rows (partitions × (cap+1)) above which the
#: global-truncation stage is inserted. 64 M rows of a 2-long probe row
#: is ~1 GB driver-side worst case — the r13 status quo for
#: dedup_clusters' 32-partition × 1 M-cutoff probe, kept one-stage; the
#: kmv 4 M-row cap (32 × 4 M = 128 M) and any real-cluster partition
#: count route through the bounded path.
DIRECT_BUDGET_ROWS = 64 * 1024 * 1024


def bounded_collect(
    df: DataFrame,
    cap: int,
    direct_budget_rows: int = DIRECT_BUDGET_ROWS,
) -> List[Row]:
    """Collect *df* bounded at ``cap + 1`` rows per partition (and, past
    the direct budget, ``cap + 1`` rows TOTAL on the driver).
    ``len(result) <= cap`` guarantees the result is the complete
    relation; ``len(result) > cap`` signals overflow (the caller's cue
    to take the distributed path or raise)."""

    def head_cap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        taken = 0
        for pdf in batches:
            if taken > cap:
                return                      # stop decoding Arrow batches
            take = min(len(pdf), cap + 1 - taken)
            taken += take
            if take:
                yield pdf.head(take)

    capped = df.mapInPandas(head_cap, df.schema)
    # Partition count is an upper-bound estimate from the compiled plan
    # (no job; AQE may coalesce at runtime, which only shrinks transfer).
    parts = df.rdd.getNumPartitions()
    if parts * (cap + 1) <= direct_budget_rows:
        return capped.collect()             # one stage, single wave
    # Global truncation: round-robin the ≤ cap+1 per-partition survivors
    # to one partition and cap once more — the downstream task stops
    # pulling shuffle blocks after cap+1 rows, the driver sees ≤ cap+1.
    return capped.repartition(1).mapInPandas(head_cap, df.schema).collect()
