"""Model-based document quality filtering (hashed linear classifier).

The model-filtering step of web-corpus curation (CCNet / fastText-style
quality classifiers): score every document with a linear model over
hashed token features and keep docs above a threshold. The *shape* here
is the production shape — hashed feature bucketing (no vocabulary
shipping), a per-token weight lookup, one mean-aggregate per document,
a sigmoid — while the weights themselves are a deterministic md5-derived
pseudo-model so both engines (and any rerun) agree bit-for-bit without
shipping a binary artifact. Swapping in real learned weights is a
one-line change: replace the derived weight expression with a broadcast
(bucket, weight) table lookup.

Everything stays in JVM expressions: explode words → hash-bucket →
derive weight → per-doc mean → sigmoid, i.e. one shuffle keyed by doc.
Scores round to 6 dp before thresholding so the keep decision cannot
flip on last-ulp exp() differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from id3c_spark.functions.text import words_array
from id3c_spark.operators.dedup import md5_bigint


def hashed_weight_int(bucket, seed: str = "qw"):
    """Deterministic integer pseudo-weight for a feature bucket: a
    28-bit md5-derived value (scaled to [-1, 1) only AFTER the per-doc
    sum, so aggregation is exact integer arithmetic — order-independent
    across partitions and engines, unlike a float mean). Same
    construction as the LSH hyperplanes (ann.hyperplanes), so the
    'model' needs no stored artifact."""
    return md5_bigint(F.concat(F.lit(seed + ":"), bucket.cast("string")))


def quality_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    seed: str = "qw",
    threshold: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, score, keep): sigmoid of the mean hashed-bucket
    weight over a doc's word tokens; keep = rounded score ≥ threshold.
    Docs with zero tokens score 0.5 exactly (empty-feature prior).

    Determinism: the per-doc aggregate is an exact bigint sum of 28-bit
    weights (sums stay far under 2^62); the single double division and
    sigmoid happen once per doc on identical inputs in every engine, and
    the score rounds to 6 dp before thresholding."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(words_array(F.col(text_col))).alias("w"),
    )
    scale = float(2 ** 27)
    scored = (
        words.select(
            "id", hashed_weight_int(md5_bigint(F.col("w")) % dim, seed).alias("h")
        )
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"), F.sum("h").alias("sum_h"))
        .select(
            "id",
            "n_tokens",
            (
                F.col("sum_h").cast("double")
                / (F.col("n_tokens") * F.lit(scale))
                - F.lit(1.0)
            ).alias("m"),
        )
        .select(
            "id",
            "n_tokens",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 6).alias("score"),
        )
    )
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("score", F.lit(0.5)).alias("score"),
            (F.coalesce("score", F.lit(0.5)) >= threshold).alias("keep"),
        )
    )
