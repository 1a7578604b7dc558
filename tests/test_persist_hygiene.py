"""Persist hygiene across the in-memory ANN / dedup operator family:
repeated calls leave ZERO storage blocks behind (a long-lived session
must not accumulate caches per call), and the leak-free plans return
bit-identical results call after call — the serve_topk discipline
(test_ann_index.py) extended to every operator VERDICT r10 flagged:
cosine_topk, cosine_pairs_above, srp_pairs, lsh_bucketed_topk,
ivf_topk, ivf_trained_topk, semantic_dedup, and the persisted dedup
index's build/query/add paths."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from id3c_spark.operators import ann


def _emb(spark, n=200):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < n)
    )


def _docs(spark, n=120):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _cached_ids(spark):
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def _new_cached(spark, baseline, deadline=10.0):
    """Cached-RDD ids beyond *baseline*, polling briefly: unpersist is
    async. Growth is measured against a pre-captured baseline rather
    than asserting a globally empty store — in a shared full-suite
    session OTHER tests may legitimately hold localCheckpoint blocks
    (e.g. a distributed dedup_clusters result) that clearCache cannot
    drop, and a loaded host stretches async-unpersist latency."""
    t0 = time.time()
    extra = None
    while time.time() - t0 < deadline:
        extra = _cached_ids(spark) - baseline
        if not extra:
            return set()
        time.sleep(0.2)
    return extra


def _assert_leak_free_and_stable(spark, build, rounds=3):
    """Call *build* repeatedly: every call collects identical rows and
    leaves no NEW cached blocks behind."""
    spark.catalog.clearCache()
    baseline = _cached_ids(spark)
    first = None
    for _ in range(rounds):
        got = sorted(map(tuple, build().collect()))
        if first is None:
            first = got
            assert first  # a leak test over an empty result proves nothing
        assert got == first
        assert _new_cached(spark, baseline) == set()


def test_cosine_topk_self_search_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark, lambda: ann.cosine_topk(emb, emb, k=3)
    )


def test_cosine_pairs_above_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark, lambda: ann.cosine_pairs_above(emb, threshold=0.35)
    )


def test_srp_pairs_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark,
        lambda: ann.srp_pairs(emb, "vec_id", "embedding",
                              bits=48, bands=12, max_hamming=11),
    )


def test_lsh_bucketed_topk_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark,
        lambda: ann.lsh_bucketed_topk(emb, emb, dim=64, k=3,
                                      planes=16, bands=4),
    )


def test_ivf_topk_self_search_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark, lambda: ann.ivf_topk(emb, emb, k=3, nlist=8, nprobe=2)
    )


def test_ivf_trained_topk_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark,
        lambda: ann.ivf_trained_topk(emb, emb, k=3, nlist=4, nprobe=2,
                                     train_iter=1),
    )


def test_semantic_dedup_leak_free(spark):
    emb = _emb(spark)
    _assert_leak_free_and_stable(
        spark, lambda: ann.semantic_dedup(emb, threshold=0.9, nlist=4)
    )


def test_dedup_index_paths_leak_free(spark, tmp_path):
    """build → repeated query → add on the persisted near-dup index: no
    path leaves cached blocks, and repeated queries return identical
    matches."""
    from id3c_spark.plans.dedup_index import (
        add_batch,
        build_dedup_index,
        dedup_against_index,
    )

    docs = _docs(spark, 120)
    batch = _docs(spark, 240).filter(F.col("doc_id") >= 120)
    path = str(tmp_path / "dedup_idx")

    spark.catalog.clearCache()
    baseline = _cached_ids(spark)
    build_dedup_index(docs, path)
    assert _new_cached(spark, baseline) == set()

    _assert_leak_free_and_stable(
        spark,
        lambda: dedup_against_index(spark, path, batch, threshold=0.2),
    )

    add_batch(spark, path, batch)
    assert _new_cached(spark, baseline) == set()


def test_ngram_jaccard_pairs_leak_free(spark):
    from id3c_spark.operators import dedup

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.3, max_df=100
        ),
    )


def test_curate_close_frees_cached_stages(spark):
    """curate() persists three shared relations; close() (or leaving a
    with-block) releases ALL of them — a long-lived session running
    curation batches must not accumulate storage blocks."""
    from id3c_spark.plans.curation import curate

    docs = _docs(spark).withColumn("source", F.lit("s"))
    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    spark.catalog.clearCache()
    baseline = _cached_ids(spark)
    stages = curate(docs, bench, jaccard_threshold=0.5)
    assert stages["sampled"].count() > 0  # populates the caches
    assert _cached_ids(spark) - baseline  # the persists are live
    stages.close()
    assert _new_cached(spark, baseline) == set()
    stages.close()  # idempotent
    # stages stay usable after close — they recompute instead of
    # reading cache
    assert stages["sampled"].count() > 0
    assert _new_cached(spark, baseline) == set()


def test_curate_stages_mapping_protocol(spark):
    """The stage handle behaves like a full mapping: membership,
    iteration, len, get, items and dict() all see the lazy tail
    entries ('packed'/'shards'), not just the eager ones."""
    from id3c_spark.plans.curation import curate

    docs = _docs(spark, n=20).withColumn("source", F.lit("s"))
    bench = spark.createDataFrame([(900, "zzz")], "doc_id long, text string")
    with curate(docs, bench) as stages:
        names = {
            "metrics", "quality", "clean", "exact", "unique", "sampled",
            "packed", "shards",
        }
        assert set(stages) == names
        assert len(stages) == len(names)
        assert "packed" in stages and "shards" in stages
        assert stages.get("nope") is None
        assert stages.get("packed") is not None
        assert set(dict(stages)) == names  # forces the lazy tail
        assert {k for k, _ in stages.items()} == names


def test_minhash_lsh_pairs_leak_free(spark):
    from id3c_spark.operators import dedup

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3),
    )


def test_prefix_filter_jaccard_pairs_leak_free(spark):
    from id3c_spark.operators import dedup

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.3
        ),
    )


def test_incremental_lsh_dedup_leak_free(spark):
    from id3c_spark.operators import dedup

    new = _docs(spark, 60)
    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 160))
        .select("doc_id", "text")
    )
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.incremental_lsh_dedup(
            new, corpus, "doc_id", "text", threshold=0.2
        ),
    )


def test_simhash_pairs_leak_free(spark):
    from id3c_spark.operators import dedup

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.simhash_pairs(docs, "doc_id", "text", max_distance=8),
    )


def test_ngram_containment_pairs_leak_free(spark):
    from id3c_spark.operators import dedup

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: dedup.ngram_containment_pairs(
            docs, "doc_id", "text", k=3, threshold=0.4, max_df=100
        ),
    )


def test_shared_span_pairs_leak_free(spark):
    from id3c_spark.operators import spans

    docs = _docs(spark, 150)
    _assert_leak_free_and_stable(
        spark,
        lambda: spans.shared_span_pairs(docs, "doc_id", "text", k=5, min_words=6),
    )


def test_top_revenue_supplier_leak_free(spark):
    from id3c_spark.plans.queries import QUERIES

    fn = QUERIES["top_revenue_supplier"]
    _assert_leak_free_and_stable(
        spark, lambda: fn(spark, "/root/testdata/sf0.001")
    )


def test_audio_fingerprint_pairs_leak_free(spark):
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from id3c_spark import multimodal as mm

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
    ])
    import numpy as np

    def tone(freq, n=2000, rate=8000, amp=0.4):
        t = np.arange(n) / rate
        return amp * np.sin(2 * np.pi * freq * t)

    rows = [
        (i, "audio", mm.encode_wav(tone(200 + 3 * (i % 4))))
        for i in range(12)
    ]
    media = spark.createDataFrame(rows, schema)
    _assert_leak_free_and_stable(
        spark, lambda: mm.audio_fingerprint_pairs(media, bands=8, max_hamming=7)
    )


def test_kmv_jaccard_leak_free(spark):
    """kmv_jaccard's sketch relation is bounded (k x |groups| rows) and
    now re-enters the plan as a local relation — one corpus scan, zero
    cached blocks left behind."""
    from id3c_spark.operators.profile import kmv_jaccard

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "source")
    )
    _assert_leak_free_and_stable(
        spark, lambda: kmv_jaccard(docs, "source", "text", k=32)
    )


def test_video_signature_pairs_leak_free(spark):
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from id3c_spark import multimodal as mm

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
    ])
    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    media = mm.synthetic_video_corpus(ids)
    # materialized synthetic corpus as the stable input relation
    rows = [(r.media_id, r.kind, bytes(r.content)) for r in media.collect()]
    fixed = spark.createDataFrame(rows, schema)
    _assert_leak_free_and_stable(
        spark, lambda: mm.video_signature_pairs(fixed, bands=8, max_hamming=7)
    )


def test_kmeans_leak_free(spark):
    """kmeans persists its prep relation across the Lloyd-iteration
    collects but must release it before returning (the r12-verdict leak:
    operators/clustering.py persisted ``vp`` and never unpersisted).
    Repeated calls leave zero new cached blocks and return bit-identical
    assignments — the returned plan recomputes one deterministic Arrow
    prep pass instead of riding the training cache."""
    from id3c_spark.operators.clustering import kmeans

    emb = _emb(spark, n=150)
    _assert_leak_free_and_stable(
        spark, lambda: kmeans(emb, k=4, max_iter=2)
    )
