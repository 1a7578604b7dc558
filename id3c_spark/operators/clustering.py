"""Distributed k-means clustering over an embedding column.

The embedding-space organizer the training-data family leans on:
SemDeDup-style semantic dedup clusters before pruning, domain discovery /
auto-curation buckets a corpus by centroid, and IVF indexes are literally
k-means cells (``ann.ivf_topk`` uses fixed data pivots for oracle
reproducibility; this module is the trained-centroid version).

Execution shape (Lloyd iterations, Spark-first):
  - centroids are a k x dim matrix — tiny — broadcast every round;
  - assignment is one Arrow-batched GEMM ``mapInPandas`` pass over the
    corpus (no shuffle, no UDF-per-row);
  - the centroid update is a single map-side-combined ``groupBy(cluster,
    dim)`` aggregation whose result is k*dim rows — bounded and collected
    like any other reduction to a broadcastable model.
  So a 100 TB corpus is scanned once per iteration with one narrow
  aggregation shuffle (rows = k*dim, not corpus-sized); nothing grows
  with N on the driver.

Determinism contract (DuckDB-oracle replayable, same discipline as
operators/ann.py):
  - init = the k vectors with the smallest ``md5(id)`` (order-invariant
    deterministic sample), components rounded to 6 dp;
  - distances are squared L2 rounded to 6 dp with centroid-index
    tiebreak, so assignment cannot flip on last-ulp differences;
  - the mean is computed over 6-dp-rounded components with an EXACT
    decimal sum (order-independent across partitionings) and a half-up
    integer-micro division (see MEAN6_EXPR) — both engines produce the
    identical centroid bit-for-bit;
  - a cluster that loses all members keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from id3c_spark.operators.ann import _prep


def mean6_aggs(xcol: str = "x") -> list:
    """Aggregates for the exact 6-dp mean: ``smi`` = sum of round(x, 6)
    in exact integer micros (a decimal sum — order-independent across any
    partitioning), ``n`` = count. Pair with MEAN6_EXPR."""
    return [
        (F.sum(F.round(F.col(xcol), 6).cast("decimal(20,6)")) * 1000000)
        .cast("long")
        .alias("smi"),
        F.count("*").alias("n"),
    ]


# half-up (away-from-zero) 6-dp mean from (smi, n), entirely in int64
# arithmetic: a double quotient re-rounded to 6 dp can land on a rounding
# tie where engines disagree — integer division cannot, so Spark and the
# DuckDB oracle produce the identical centroid by construction. The final
# /1e6 is one double op both engines perform on the same integer.
MEAN6_EXPR = (
    "CASE WHEN smi >= 0 THEN (2 * smi + n) div (2 * n) "
    "ELSE -((2 * (-smi) + n) div (2 * n)) END / 1000000.0"
)


def _assign(vp: DataFrame, bc, with_dist: bool = False) -> DataFrame:
    """(id, cluster[, dist]) — nearest centroid by 6-dp squared L2,
    centroid-index tiebreak (np.argmin picks the first minimum, matching
    the oracle's ORDER BY dist, cl). One GEMM-style pass, no shuffle."""
    import numpy as np
    import pandas as pd

    schema = "id long, cluster long" + (", dist double" if with_dist else "")

    def gen(batches):
        cent = bc.value  # k x dim, 6-dp rounded
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            d2 = np.round(
                ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), 6
            )
            cl = d2.argmin(axis=1)
            out = {"id": pdf["id"].values, "cluster": cl.astype("int64")}
            if with_dist:
                out["dist"] = d2[np.arange(len(cl)), cl]
            yield pd.DataFrame(out)

    return vp.mapInPandas(gen, schema)


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 2,
) -> DataFrame:
    """Lloyd k-means: *max_iter* assign/update rounds from the
    deterministic md5 seed, then a final assignment. Returns
    ``(id_col, cluster, dist)`` where cluster is the 0-based index of the
    seed ordering and dist the 6-dp squared L2 to the final centroid."""
    import numpy as np

    vp = _prep(df, id_col, vec_col).persist()
    sc = vp.sparkSession.sparkContext
    seed = (
        vp.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k)
        .collect()
    )
    cent = np.round(
        np.asarray([np.asarray(r.v, dtype=np.float64) for r in seed]), 6
    )
    for _ in range(max_iter):
        bc = sc.broadcast(cent)
        rows = (
            _assign(vp, bc)
            .join(vp, "id")
            .select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(*mean6_aggs())
            .selectExpr("cluster", "dim", f"{MEAN6_EXPR} AS c")
            .collect()
        )
        new = cent.copy()  # empty clusters keep their previous centroid
        for r in rows:
            new[r.cluster][r.dim] = r.c
        cent = new
        bc.destroy()
    # training actions (seed collect + per-iteration centroid collects) are
    # done — release the cached prep relation NOW so a long-lived session
    # doesn't accumulate storage blocks across calls (the pq.py:585 recipe).
    # The returned lazy plan recomputes one deterministic _prep Arrow pass;
    # assignment math is 6-dp-rounded with index tiebreak, so the result is
    # bit-identical with or without the cache.
    vp.unpersist()
    out = _assign(vp, sc.broadcast(cent), with_dist=True)
    return out.select(
        F.col("id").alias(id_col), "cluster", "dist"
    )
