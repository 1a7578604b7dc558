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

Bounds and detection semantics are identical to the limit-probe:

  - worst-case driver transfer is partitions × (cap + 1) rows — the same
    bound as the ramp's final wave (each task's LocalLimit emitted cap+1
    there too);
  - if the TRUE row count ≤ cap, no partition can hit the per-partition
    cap, so the collected list is provably COMPLETE;
  - if rows were dropped anywhere, the dropping partition alone
    contributed cap + 1 rows, so ``len(result) > cap`` still holds —
    overflow is always detected, never masked.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, Row


def bounded_collect(df: DataFrame, cap: int) -> List[Row]:
    """Collect *df* in one single-wave job, bounded at ``cap + 1`` rows
    per partition.  ``len(result) <= cap`` guarantees the result is the
    complete relation; ``len(result) > cap`` signals overflow (the
    caller's cue to take the distributed path or raise)."""

    def head_cap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        taken = 0
        for pdf in batches:
            if taken > cap:
                return                      # stop decoding Arrow batches
            take = min(len(pdf), cap + 1 - taken)
            taken += take
            if take:
                yield pdf.head(take)

    return df.mapInPandas(head_cap, df.schema).collect()
