"""Training-corpus curation operators (north-star family).

Three stages every large-scale LLM data pipeline runs between raw scrape
and tokenization, built Spark-first:

  - repetition_metrics  — Gopher-style per-document repetition / quality
    signals (duplicate-word fraction, top-word fraction, duplicate-bigram
    fraction, mean word length) + a keep flag. One explode + two
    map-side-combined aggregations at doc granularity; no Python.
  - decontaminate       — flag corpus documents sharing any k-gram word
    shingle with a benchmark/eval set (the standard n-gram overlap
    decontamination from GPT-3/Gopher/Llama reports). The benchmark
    shingle set is small by construction → broadcast semi/inner join, so
    the 100 TB corpus never shuffles.
  - stratified_sample   — deterministic hash-based per-stratum sampling
    (md5(id) mod M < rate*M). Reproducible across runs/engines (no RNG
    state), embarrassingly parallel, no shuffle at all: the predicate is
    a pushable scan filter.

All hashing is md5-derived so DuckDB oracles can mirror it bit-for-bit
(same trick as operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from id3c_spark.functions.text import word_shingles, words_array


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top_word_frac: float = 0.2,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Per-document repetition metrics + keep flag (Gopher §A1-style).

    Output: id, n_words, distinct_ratio (distinct words / words),
    top_word_frac (most frequent word's share), dup_bigram_frac
    (1 - distinct bigrams / bigrams), mean_word_len, keep.

    Shape: one explode to word grain, one groupBy(id, word) partial-agg,
    one groupBy(id) rollup — both aggs map-side combine, so the shuffle
    carries (id, word) counts, not raw words. Bigram stats stay pure
    array expressions (no second explode).
    """
    words = df.select(
        F.col(id_col).alias("id"), words_array(F.col(text_col)).alias("ws")
    )
    per_word = (
        words.select("id", F.explode("ws").alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("c"), F.sum(F.length("w")).alias("chars"))
    )
    word_stats = per_word.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.sum("chars").alias("n_chars"),
    )
    # word_shingles' zip_with shape, NOT an index-lambda over sequence():
    # the latter inlines the words-split into the lambda and re-splits the
    # text once per element — O(words²) regex work (see word_shingles).
    bigrams = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), 2).alias("bg"),
    ).select(
        "id",
        F.size("bg").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).alias("n_distinct_bigrams"),
    )
    out = (
        word_stats.join(bigrams, "id")
        .select(
            F.col("id"),
            F.col("n_words"),
            F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("distinct_ratio"),
            F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
            F.when(F.col("n_bigrams") > 0,
                   F.round(1 - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6)
                   ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
            F.round(F.col("n_chars") / F.col("n_words"), 6).alias("mean_word_len"),
        )
        .withColumn(
            "keep",
            (F.col("top_word_frac") <= max_top_word_frac)
            & (F.col("distinct_ratio") >= min_distinct_ratio),
        )
    )
    return out


def _shingle_relation(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct (id, k-word-shingle) relation via word_shingles (zip_with
    chain — one split per row, not per shingle)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), k)).alias("s"),
        )
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Contaminated corpus docs: share >= 1 distinct k-gram word shingle
    with the benchmark set. Returns (id, n_hits = distinct overlapping
    shingles), contaminated docs only.

    Scale shape: the benchmark side is eval sets (MBs), the corpus is the
    100 TB side — so the benchmark's distinct shingle set is broadcast and
    the corpus-side relation joins it map-side with NO corpus shuffle
    before the final per-doc count (which combines map-side)."""
    bench_sh = _shingle_relation(benchmark, id_col, text_col, k).select("s").distinct()
    corpus_sh = _shingle_relation(corpus, id_col, text_col, k)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )


def hash_bucket(col: Column, buckets: int = 1000000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5 — identical
    arithmetic is expressible in DuckDB ('0x'||substr(md5(x),1,12))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10)
        .cast("bigint") % F.lit(buckets)
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 1000000,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    md5(id) mod buckets < rate(stratum) * buckets.

    Reproducible (pure function of the id — stable across runs, engines,
    partitionings; rows join-able across pipeline versions), and shuffle-
    free: the predicate evaluates at the scan, so Catalyst pushes the
    stratum filter down and the sample costs one pass. This is the
    sampling discipline a 100 TB mixer wants — rerunning with a raised
    rate strictly grows the previous sample (nested samples)."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    thresh = F.floor(rate * buckets).cast("bigint")
    return df.filter(hash_bucket(F.col(id_col), buckets) < thresh)
