"""Bloom-filter membership for corpus-scale decontamination / dedup.

corpus.decontaminate broadcasts the benchmark's *distinct shingle set*
— exactly right while the benchmark is eval-set sized (MBs). When the
"benchmark" is itself huge (e.g. "drop anything whose shingles were seen
in last month's 100 TB crawl"), the string set no longer broadcasts, but
a Bloom filter of it does: m bits summarize n keys at ~10 bits/key for
~1% false positives, independent of key length. The corpus side then
needs NO join at all — membership is a map-only probe of a broadcast
bitset, the cheapest possible 100 TB-side plan.

Build shape (all distributed): keys → k md5-derived bit positions →
(byte_idx, bit) → groupBy byte_idx with a bit_or aggregate → collect
m/8 SET bytes at most (bounded by the filter size, NOT the key count) →
pack into one bytes object → spark broadcast.

Probe shape: positions are computed JVM-side (same md5 expressions);
only the final bitset lookup is Python — an Arrow-batched pandas UDF
doing three vectorized numpy ops per batch.

Determinism: position j of key s is ('0x'||substr(md5(j||':'||s),1,12))
::BIGINT % m in DuckDB and the identical conv(substr(md5(...)))
arithmetic here, so a SQL oracle can replay membership exactly: a probe
is "in" iff all k of its positions appear in the benchmark's distinct
position set — Bloom semantics, mirrored without the bit packing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bit_positions(col: Column, m: int, k: int) -> Column:
    """array<bigint> of *k* md5-derived positions in [0, m) for a key.

    12 hex chars < 2^48 — no bigint overflow; arithmetic is identical in
    DuckDB (('0x' || substr(md5(j || ':' || s), 1, 12))::BIGINT % m).
    """
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 12), 16, 10
            ).cast("bigint")
            % F.lit(m)
            for j in range(k)
        ]
    )


def build_bloom(keys: DataFrame, key_col: str, m: int, k: int = 3) -> bytes:
    """Build an m-bit Bloom filter over the distinct values of *key_col*.

    Fully distributed until the final collect, which returns at most m/8
    rows (one per byte that has any bit set) — bounded by the filter
    size, never by the number of keys. m should be a multiple of 8.
    """
    pos = (
        keys.select(
            F.explode(bit_positions(F.col(key_col), m, k)).alias("pos")
        )
        .distinct()
        .select(
            F.shiftright(F.col("pos"), 3).alias("byte_idx"),
            F.expr("shiftleft(1, cast(pos % 8 AS INT))").alias("bit"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("bit").alias("byte_val"))
        .collect()
    )
    buf = bytearray((m + 7) // 8)
    for row in pos:
        buf[row["byte_idx"]] = row["byte_val"]
    return bytes(buf)


def bloom_member(
    spark: SparkSession, bloom: bytes, positions: Column, k: int
) -> Column:
    """Boolean column: all *k* positions set in the broadcast bitset.

    Arrow-batched; per batch it's three vectorized numpy ops over an
    (n, k) int64 matrix — no per-row Python.
    """
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _member(pos_ser: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos_ser) == 0:
            return pd.Series([], dtype=bool)
        arr = np.asarray(pos_ser.tolist(), dtype=np.int64)
        ok = ((bits[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1).all(axis=1)
        return pd.Series(ok)

    return _member(positions)


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    m: int = 1 << 20,
    k_hash: int = 3,
) -> DataFrame:
    """Contamination candidates by Bloom membership of word shingles.

    Returns (id, n_candidates): corpus docs with ≥ 1 distinct k-gram
    shingle whose k_hash Bloom probes all hit the benchmark filter.
    Supersets corpus.decontaminate's exact answer (false positives only,
    never negatives) — the scale trade documented in the module header.
    The corpus side is probe-only: shingle explode (the same codegen
    relation the dedup family uses) + broadcast bitset test + one
    map-side-combined per-doc count. No corpus-vs-benchmark join.
    """
    from id3c_spark.operators.corpus import _shingle_relation

    bench_sh = _shingle_relation(benchmark, id_col, text_col, k_shingle)
    bloom = build_bloom(bench_sh, "s", m=m, k=k_hash)
    corpus_sh = _shingle_relation(corpus, id_col, text_col, k_shingle)
    probed = corpus_sh.withColumn(
        "hit",
        bloom_member(
            corpus.sparkSession, bloom, bit_positions(F.col("s"), m, k_hash), k_hash
        ),
    )
    return (
        probed.filter(F.col("hit"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
