"""Model-free document embeddings by feature hashing (Weinberger et al.
2009) — the bridge from a text corpus to the vector operator family
(ANN, semantic dedup, k-means, margin mining) when no learned encoder
is available or allowed.

Each word hashes to one of *dim* buckets with an md5-derived ±1 sign;
a document's vector is the signed bucket-count vector, L2-normalized.
Inner products of these sketches approximate vocabulary overlap, so
near-duplicate and topically-close documents land close in cosine —
the classic hashing-trick bag-of-words, with the md5 construction the
rest of the repo uses for engine-replayable pseudo-randomness.

Scale shape: explode words → (id, bucket, ±1) → ONE id,bucket-keyed
sum (map-side combined, exact integers) → a 64-row-per-doc grid join +
row-local normalize. No vocabulary is built or shipped; memory is
O(dim) per document regardless of corpus size. Everything is exact
integer arithmetic until one double division per (doc, dim), so the
catalog oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from id3c_spark.functions.text import words_array
from id3c_spark.operators.dedup import md5_bigint


def hashed_doc_embeddings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
) -> DataFrame:
    """(id, dim, v): L2-normalized signed hashed bag-of-words, one row
    per (document, dimension) — exploded form so downstream packing /
    comparison is layout-free. Documents with no words emit all-zero
    rows."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(words_array(F.col(text_col))).alias("w"),
    )
    sign = F.when(
        md5_bigint(F.concat(F.lit("sg:"), F.col("w"))) % 2 == 0, 1
    ).otherwise(-1)
    v = (
        words.select(
            "id", (md5_bigint(F.col("w")) % F.lit(dim)).alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy("id", "bucket")
        .agg(F.sum("sign").alias("s"))
    )
    n2 = v.groupBy("id").agg(F.sum(F.col("s") * F.col("s")).alias("nrm2"))
    grid = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("dim"),
    )
    return (
        grid.join(v, (grid["id"] == v["id"]) & (grid["dim"] == v["bucket"]), "left")
        .select(grid["id"], grid["dim"], F.coalesce(v["s"], F.lit(0)).alias("s"))
        .join(n2, "id", "left")
        .select(
            "id",
            "dim",
            F.round(
                F.when(
                    F.col("nrm2") > 0,
                    F.col("s").cast("double")
                    / F.sqrt(F.col("nrm2").cast("double")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("v"),
        )
    )
