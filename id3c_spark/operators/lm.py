"""N-gram language-model operators for corpus quality filtering and
data selection (north-star family).

Two published techniques every large-scale training-data pipeline runs:

  - **Bigram LM cross-entropy scoring** (CCNet-style quality filtering,
    Wenzek et al. 2020 trained KenLM models and kept low-perplexity
    text): train an add-one-smoothed bigram model on the corpus itself
    and score each document by its per-bigram cross-entropy. Outlier
    documents (gibberish, boilerplate, wrong language) score high.
  - **DSIR importance reweighting** (Data Selection via Importance
    Resampling, Xie et al. 2023): represent target and raw corpora as
    hashed-unigram bucket distributions, weight each raw document by the
    log-likelihood ratio of its tokens under target vs raw, and keep the
    highest-weight documents. Hashing makes the feature space a fixed,
    tiny B — the whole model broadcasts.

The reference has no LM operators (closest analogue: the quality/manifest
QC filters, `/root/reference/lib/id3c/cli/command/manifest.py:533-589`);
these extend the corpus toolkit the same way dedup/decontamination do.

Scale shape (100 TB):
  - Bigrams are built ROW-LOCALLY with the zip_with shingle chain
    (functions/text.word_shingles) — no window/shuffle to pair adjacent
    tokens. The only corpus-grain shuffles are the count aggregations,
    all map-side combined, and the count-join back to bigram occurrences,
    keyed on the bigram/history — the canonical word-count shape.
  - The bigram/unigram count relations are vocabulary-sized, not
    corpus-sized; they shuffle-join (AQE may broadcast when small).
  - DSIR's model is exactly B rows (default 256) — broadcast both ways;
    the raw corpus is scanned twice (count pass, score pass) and never
    shuffled at token grain beyond the B-key map-side-combined agg.

Determinism for the DuckDB oracle (plans/queries.py discipline): per-item
log terms are rounded to 8 dp as DECIMAL(18,8) before the exact sum;
final scores rounded to 6 dp before ranking with id tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from id3c_spark.functions.text import word_shingles, words_array
from id3c_spark.operators.dedup import md5_bigint


def _tokens(docs: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    """(id, w [, extra…]): one exploded lowercase-alpha token per row."""
    return docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra],
        F.explode(words_array(F.col(text_col))).alias("w"),
    )


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed bigram LM
    trained on the corpus itself.

        P(w2 | w1) = (c(w1 w2) + 1) / (c(w1·) + V)

    where c(w1·) counts w1 as a bigram history and V is the corpus
    unigram vocabulary size. Returns (id, n_bigrams, cross_entropy) for
    every document with ≥ 2 alpha words; cross_entropy = −mean log P,
    lower = more typical text.

    Train and score are the same pass here (self-scoring, the common
    "filter the corpus against itself" mode); to score against a foreign
    reference corpus, compute `cb`/`c1`/`v` from that corpus instead —
    the plan shape is identical.
    """
    # Bigram occurrences, built row-locally (no shuffle): shingle k=2.
    bg = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), 2)).alias("bg"),
    ).withColumn("w1", F.substring_index("bg", " ", 1))
    cb = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cbg"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ch"))
    v = (
        _tokens(docs, id_col, text_col)
        .agg(F.countDistinct("w").alias("vsz"))
    )
    lp = F.round(
        F.log((F.col("cbg") + F.lit(1.0)) / (F.col("ch") + F.col("vsz"))), 8
    ).cast("decimal(18,8)")
    scored = (
        bg.join(cb, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("id", lp.alias("lp"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias(
            "cross_entropy"
        ),
    ).select(F.col("id").alias(id_col), "n_bigrams", "cross_entropy")


def dsir_top_docs(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    k: int = 50,
) -> DataFrame:
    """Top-k documents by DSIR importance weight toward a target slice.

    *is_target* is a boolean Column over `docs` marking the target
    distribution (e.g. `F.col("lang") == "en"`); weights are computed for
    ALL documents (target membership only shapes the model), so the
    caller can select from the raw pool however it likes.

    weight(d) = Σ_{w ∈ d} log( p_target(bucket(w)) / p_raw(bucket(w)) )
    with add-one-smoothed bucket probabilities over B md5-hash buckets.

    Returns (id, n_tokens, weight, rank), rank ≤ k by weight desc with
    id tiebreak.
    """
    tk = _tokens(docs.withColumn("__t", is_target), id_col, text_col, "__t").select(
        "id", "__t", (md5_bigint(F.col("w")) % n_buckets).alias("bkt")
    )
    # ONE corpus-grain pass → B-row model: raw + target counts together.
    b = tk.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
    )
    tot = b.agg(F.sum("cr").alias("r"), F.sum("ct").alias("t"))
    lr = F.round(
        F.log(
            ((F.col("ct") + F.lit(1.0)) / (F.col("t") + F.lit(float(n_buckets))))
            / ((F.col("cr") + F.lit(1.0)) / (F.col("r") + F.lit(float(n_buckets))))
        ),
        8,
    ).cast("decimal(18,8)")
    ratio = b.crossJoin(F.broadcast(tot)).select("bkt", lr.alias("lr"))
    sc = (
        tk.join(F.broadcast(ratio), "bkt")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr").cast("double"), 6).alias("weight"),
        )
    )
    top = sc.orderBy(F.col("weight").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("weight").desc(), F.col("id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        F.col("id").alias(id_col), "n_tokens", "weight", "rank"
    )
