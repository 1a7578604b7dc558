"""Persisted near-dup index: the cross-batch dedup store
``incremental_lsh_dedup``'s docstring promises ("the corpus side's
banded signatures are the natural thing to persist in the warehouse
between batches").

Two cell-addressed tables in the versioned store:

  - ``signatures`` (id, band, bh) — the corpus's banded MinHash keys.
    A new batch broadcasts ITS signatures onto this scan, so candidate
    generation never shuffles the corpus side (per-batch cost is
    O(batch), the only sane shape when the corpus is 100 TB and the
    batch is megabytes).
  - ``shingles`` (id, sh) — the distinct-shingle evidence, CLUSTERED BY
    id: the exact-Jaccard verify reads ONLY the candidate ids' files
    (read_pruned_in footer pruning), never the whole relation.

``add_batch`` appends a deduped batch file-granularly (existing files
hard-link forward), so the index grows with ingest instead of being
rebuilt. Results are pinned bit-equal to the in-memory
``dedup.incremental_lsh_dedup`` by test (same shingling, hash family,
banding, and exact verify)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from id3c_spark.operators import dedup
from id3c_spark.sources.store import ParquetTable


def _tables(spark: SparkSession, path: str) -> dict[str, ParquetTable]:
    return {
        name: ParquetTable(spark, f"{path}/{name}")
        for name in ("signatures", "shingles")
    }


def _batch_relations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    bands: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(distinct shingles (id, sh), banded signatures (id, band, bh),
    persisted shingle-occurrence relation) for one side — the same
    primitives incremental_lsh_dedup composes. The returned occurrence
    relation is PERSISTED (it feeds both outputs); the caller must
    ``unpersist()`` it once its own actions are done, or repeated calls
    accumulate storage blocks in a long-lived session."""
    occ = dedup._exploded_shingles(df, id_col, text_col, k).persist()
    sigs = dedup._minhash_banded(occ, num_hashes, bands)
    return occ.distinct(), sigs, occ


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    files_per_table: int = 8,
) -> dict[str, int]:
    """Publish the signatures + shingles tables for *corpus*."""
    assert num_hashes % bands == 0
    spark = corpus.sparkSession
    sh, sigs, occ = _batch_relations(corpus, id_col, text_col, k, num_hashes, bands)
    t = _tables(spark, path)
    versions = {
        "signatures": t["signatures"].publish(
            sigs, cluster_by=["band", "bh"], partitions=files_per_table
        ),
        "shingles": t["shingles"].publish(
            sh, cluster_by=["id"], partitions=files_per_table
        ),
    }
    occ.unpersist()  # both publishes (the cache's consumers) are done
    return versions


def dedup_against_index(
    spark: SparkSession,
    path: str,
    new_batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    prune_cap: int = 100_000,
) -> DataFrame:
    """(new_id, corpus_id, jaccard ≥ threshold): which incoming docs
    duplicate something already indexed. The batch's banded signatures
    broadcast onto the corpus signature scan (no corpus shuffle); the
    exact verify reads only candidate corpus ids' shingle files.

    File pruning is best-effort and BOUNDED: at most *prune_cap* distinct
    candidate ids are collected to drive ``read_pruned_in`` (mirroring
    merge_publish's cap-and-fallback). A hot band hash that matches a
    large fraction of the corpus — where the collect would otherwise be
    O(corpus) driver memory and a pathological isin expression — instead
    falls back to scanning the full shingles table; the equi-join on the
    candidate pairs keeps results identical either way."""
    t = _tables(spark, path)
    batch_sh, batch_sigs, occ = _batch_relations(
        new_batch, id_col, text_col, k, num_hashes, bands
    )
    cand = (
        t["signatures"].read().alias("c")
        .join(
            F.broadcast(batch_sigs.alias("n")),
            (F.col("c.band") == F.col("n.band")) & (F.col("c.bh") == F.col("n.bh")),
        )
        .select(F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .distinct()
        .persist()
    )
    cand_ids = [
        r.corpus_id
        for r in cand.select("corpus_id").distinct().limit(prune_cap + 1).collect()
    ]
    # the prune collect — the action the caches span — is done: release
    # both NOW (the pq.py discipline) rather than leaking storage blocks
    # past this call. The lazy tail re-derives each at most once, fully
    # deterministically (md5 shingles/hashes, broadcast batch side, a
    # versioned immutable corpus table), so results are bit-identical;
    # the recomputes are one batch re-shingle + one candidate-join pass.
    occ.unpersist()
    cand.unpersist()
    if len(cand_ids) > prune_cap:
        corpus_sh = t["shingles"].read()
    else:
        corpus_sh = t["shingles"].read_pruned_in("id", cand_ids)
    sizes_new = batch_sh.groupBy("id").agg(F.count("*").alias("n_new"))
    sizes_corpus = corpus_sh.groupBy("id").agg(F.count("*").alias("n_corpus"))
    inter = (
        cand.join(batch_sh.withColumnsRenamed({"id": "new_id"}), "new_id")
        .join(
            corpus_sh.withColumnsRenamed({"id": "corpus_id"}),
            ["corpus_id", "sh"],
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("n_inter"))
    )
    jaccard = F.round(
        F.col("n_inter").cast("double")
        / (F.col("n_new") + F.col("n_corpus") - F.col("n_inter")).cast("double"),
        6,
    )
    return (
        inter
        .join(sizes_new.withColumnsRenamed({"id": "new_id"}), "new_id")
        .join(sizes_corpus.withColumnsRenamed({"id": "corpus_id"}), "corpus_id")
        .filter(jaccard >= threshold)
        .select("new_id", "corpus_id", jaccard.alias("jaccard"))
    )


def add_batch(
    spark: SparkSession,
    path: str,
    new_batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> dict[str, int]:
    """Append a (deduped) batch's signatures and shingles to the index —
    file-granular, so ingest cost is O(batch), and future batches dedup
    against old + new together."""
    t = _tables(spark, path)
    sh, sigs, occ = _batch_relations(new_batch, id_col, text_col, k, num_hashes, bands)
    versions = {
        "signatures": t["signatures"].append(sigs.select("id", "band", "bh")),
        "shingles": t["shingles"].append(sh.select("id", "sh")),
    }
    occ.unpersist()  # both appends (the cache's consumers) are done
    return versions
