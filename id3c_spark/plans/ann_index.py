"""Persisted ANN index: build once, serve many — the missing half of the
IVFADC story. ``ivfpq_topk`` proves the algorithm; this module gives it
the production layout: the trained models and encoded corpus live in
versioned ParquetTables (atomic publish, time travel), the codes and
vectors tables are CLUSTERED BY coarse cell, and serving reads ONLY the
probed cells' files via footer-stats pruning (store.read_pruned_in).

At 100 TB that layout is the whole point of an IVF index: a query batch
probing nprobe of nlist cells opens nprobe/nlist of the table's files —
the Spark translation of FAISS's inverted lists — while training cost
amortizes over every batch served instead of re-paying per lookup
(reference analogue: id3c's warehouse is also a write-once/read-many
store; there is no ANN in the reference — this is beyond-reference
LLM-pipeline surface).

Serving reuses pq._adc_topk — the EXACT code path ivfpq_topk scores
with — so a persisted index returns bit-identical results to the
in-memory oracle-verified operator (pinned by test)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from id3c_spark.sources.store import ParquetTable


def _tables(spark: SparkSession, path: str) -> dict[str, ParquetTable]:
    return {
        name: ParquetTable(spark, f"{path}/{name}")
        for name in ("centroids", "codebooks", "codes", "vectors")
    }


def build_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 32,
    kcent: int = 16,
    train_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_table: int | None = None,
) -> dict[str, int]:
    """Train the residual-IVFPQ models and publish the four index tables
    (same training discipline as ivfpq_topk's default path: normalized
    vectors, trained coarse, SALTED residual codebooks). codes and
    vectors cluster by cell so each file's footer covers a narrow cell
    range. Returns the published version per table."""
    from id3c_spark.operators.ann import _prep
    from id3c_spark.operators.pq import (
        _assign_topn,
        _normalized,
        _residuals,
        pq_encode,
        pq_train,
    )

    spark = corpus.sparkSession
    vn = _normalized(_prep(corpus, id_col, vec_col)).persist()
    coarse = pq_train(vn, "id", "v", m=1, k=nlist, max_iter=train_iter)
    bcg = spark.sparkContext.broadcast(coarse)
    cells = _assign_topn(vn, bcg, 1).persist()
    enc_src = _residuals(vn, cells, bcg).persist()
    books = pq_train(
        enc_src, "id", "v", m=m, k=kcent, max_iter=train_iter, seed_salt=":pq"
    )
    codes = pq_encode(enc_src, books, "id", "v")

    t = _tables(spark, path)
    files = files_per_table or min(nlist, 8)
    versions = {
        "centroids": t["centroids"].publish(
            spark.createDataFrame(
                [(c, [float(x) for x in coarse[0][c]]) for c in range(nlist)],
                "cell long, v array<double>",
            )
        ),
        "codebooks": t["codebooks"].publish(
            spark.createDataFrame(
                [
                    (s, c, [float(x) for x in books[s][c]])
                    for s in range(m)
                    for c in range(kcent)
                ],
                "sub int, code int, c array<double>",
            )
        ),
        "codes": t["codes"].publish(
            codes.join(cells, "id").select("id", "cell", "codes"),
            cluster_by=["cell"],
            partitions=files,
        ),
        "vectors": t["vectors"].publish(
            vn.join(cells, "id").select("id", "cell", "v"),
            cluster_by=["cell"],
            partitions=files,
        ),
    }
    vn.unpersist()
    cells.unpersist()
    enc_src.unpersist()
    return versions


def _load_models(spark: SparkSession, path: str):
    import numpy as np

    t = _tables(spark, path)
    cent_rows = t["centroids"].read().collect()
    nlist = len(cent_rows)
    d = len(cent_rows[0].v)
    coarse = np.zeros((1, nlist, d))
    for r in cent_rows:
        coarse[0][r.cell] = np.asarray(r.v, dtype=np.float64)
    book_rows = t["codebooks"].read().collect()
    m = 1 + max(r.sub for r in book_rows)
    kc = 1 + max(r.code for r in book_rows)
    dsub = len(book_rows[0].c)
    books = np.zeros((m, kc, dsub))
    for r in book_rows:
        books[r.sub][r.code] = np.asarray(r.c, dtype=np.float64)
    return coarse, books, t


def add_to_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, int]:
    """Incremental ingest (FAISS ``add()``): encode *new_vectors* with
    the STORED models — no retraining — and append their codes and
    normalized vectors to the index tables. ParquetTable.append is
    file-granular (existing files hard-link forward), so ingest costs
    O(batch), and the new files' footer cell ranges join the pruning
    like any other. Quantizer drift under a shifted distribution is the
    operator's call: rebuild with build_index when recall decays."""
    from id3c_spark.operators.ann import _prep
    from id3c_spark.operators.pq import (
        _assign_topn,
        _normalized,
        _residuals,
        pq_encode,
    )

    coarse, books, t = _load_models(spark, path)
    bcg = spark.sparkContext.broadcast(coarse)
    vn = _normalized(_prep(new_vectors, id_col, vec_col)).persist()
    cells = _assign_topn(vn, bcg, 1).persist()
    codes = pq_encode(_residuals(vn, cells, bcg), books, "id", "v")
    versions = {
        "codes": t["codes"].append(
            codes.join(cells, "id").select("id", "cell", "codes")
        ),
        "vectors": t["vectors"].append(
            vn.join(cells, "id").select("id", "cell", "v")
        ),
    }
    vn.unpersist()
    cells.unpersist()
    return versions


def serve_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_shortlist: int | None = None,
) -> DataFrame:
    """Serve a query batch from the persisted index: broadcast the
    stored models (nlist·d + m·k*·dsub doubles — tiny), assign each
    query its nprobe cells, then score through pq._adc_topk against
    ONLY the probed cells' code files (read_pruned_in — the scan list
    is the file-level inverted-list lookup). *rerank_shortlist* adds the
    IVFADC+R refine: the ADC shortlist reranked by true cosine against
    the vectors table (also probed-cell-pruned reads via the shortlist
    join)."""
    from id3c_spark.operators.ann import _prep, exact_rerank
    from id3c_spark.operators.pq import _adc_topk, _assign_topn, _normalized

    coarse, books, t = _load_models(spark, path)
    bcg = spark.sparkContext.broadcast(coarse)
    qn = _normalized(_prep(queries, id_col, vec_col)).persist()
    probes = _assign_topn(qn, bcg, nprobe)
    probe_vecs = probes.join(qn, "id").persist()
    probed = [r.cell for r in probe_vecs.select("cell").distinct().collect()]
    codes_cells = t["codes"].read_pruned_in("cell", probed).select(
        "id", "cell", "codes"
    )
    # cell_splits=4: a long-lived index accumulates ingest drift — the
    # hot-cell bound matters here, and serving ks are small enough that
    # the ~4× partial-top-k growth is noise
    short = _adc_topk(
        probe_vecs, codes_cells, books, bcg, k=rerank_shortlist or k,
        residual=True, cell_splits=4,
    )
    if rerank_shortlist is None:
        return short
    corpus_vecs = t["vectors"].read().select(
        F.col("id").alias(id_col), F.col("v").alias(vec_col)
    )
    return exact_rerank(
        qn.select(F.col("id").alias(id_col), F.col("v").alias(vec_col)),
        corpus_vecs,
        short,
        k=k,
    )
