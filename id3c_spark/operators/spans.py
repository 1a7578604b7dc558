"""Shared-substring (duplicate-span) detection between documents.

Document-level near-dup (MinHash/SimHash, operators/dedup.py) misses
*partial* duplication — boilerplate headers, quoted passages, licence
blocks — which substring-level dedup removes (the approach popularized
for LLM corpora by suffix-array dedup; this is the distributed k-gram
formulation of the same idea). The reference's closest analogue is the
manifest content-hash diff (whole-record identity); this generalizes to
maximal shared word-level spans.

Algorithm (all DataFrame ops, one self-join + one window):
  1. positional k-word shingles per doc: (id, pos, h = md5(shingle))
  2. document-frequency cap drops boilerplate-of-the-corpus shingles
     whose posting lists would make the self-join quadratic (same
     stop-shingle discipline as dedup.ngram_jaccard_pairs)
  3. self-join on h (id_a < id_b): each match is a point on an alignment
     diagonal d = pos_a − pos_b
  4. islands-and-gaps per (id_a, id_b, d): consecutive pos_a runs merge
     into maximal spans; a run of m matched k-shingles covers m+k−1 words
  5. keep spans ≥ min_words

Scale: the join shuffles on shingle hash (uniform md5 keys, AQE splits
stragglers), the window shuffles on (id_a, id_b, d) — both well-keyed;
no driver materialization, no UDFs. The df-cap bounds per-key fanout the
way prefix filtering bounds SSJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from id3c_spark.operators.dedup import _exploded_shingles


def positional_shingles(
    docs: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(id, pos, h): 1-based shingle start position and md5 hash — built on
    the codegen explode+window shingle relation (see dedup.py), not the
    interpreted per-row HOF."""
    return _exploded_shingles(docs, id_col, text_col, k, with_pos=True).select(
        "id", (F.col("pos") + 1).cast("int").alias("pos"), F.md5("sh").alias("h")
    )


def shared_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_words: int = 8,
    max_df: int | None = 200,
) -> DataFrame:
    """Maximal shared word spans between document pairs.

    Returns (id_a, id_b, start_a, start_b, len_words) with
    len_words >= min_words; start positions are 1-based word offsets.
    """
    # The shingle relation feeds the df-cap aggregate AND both sides of
    # the self-join — share it through ONE explicit Exchange(h) rather
    # than a persist (the return is lazy, so a cache here could never be
    # released): the hot-hash aggregate, the broadcast anti-join, and
    # both join sides all sit ABOVE the identical exchange, so the
    # explode+window+md5 pass (the dominant per-row cost) is a single
    # ReusedExchange per action and the h-keyed equi-join needs no
    # further shuffle.
    sh = positional_shingles(docs, id_col, text_col, k).repartition("h")
    if max_df is not None:
        hot = sh.groupBy("h").agg(F.countDistinct("id").alias("df")).filter(
            F.col("df") > max_df
        )
        sh = sh.join(F.broadcast(hot.select("h")), "h", "left_anti")

    a = sh.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "h")
    hits = a.join(b, "h").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "pos_a", "pos_b", (F.col("pos_a") - F.col("pos_b")).alias("d")
    )

    w = Window.partitionBy("id_a", "id_b", "d").orderBy("pos_a")
    runs = hits.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
    spans = (
        runs.groupBy("id_a", "id_b", "d", "grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count("*") + (k - 1)).cast("int").alias("len_words"),
        )
        .filter(F.col("len_words") >= min_words)
        .select("id_a", "id_b", "start_a", "start_b", "len_words")
    )
    return spans
