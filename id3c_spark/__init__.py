"""id3c_spark — a PySpark-native analytics engine with the capabilities of
seattleflu/id3c (reference: /root/reference, PostgreSQL-based ETL warehouse).

This is NOT a port: the reference's capabilities (document-log ingestion,
incremental ETL, MERGE-style warehouse writes, analytical shipping views,
identifier minting with similarity checks) are re-expressed as idiomatic
Spark DataFrame / SQL plans so Catalyst + Tungsten pick the physical
strategy and the whole pipeline scales out.

Layout:
    session     — tuned SparkSession factory
    schemas     — StructTypes for warehouse/receiving tables (SURVEY §1)
    functions   — scalar function library (SURVEY §2.8)
    operators   — merge/upsert, range join, top-k, diff, dedup, similarity
    sources     — NDJSON / CSV / parquet readers with id3c semantics
    plans       — the analytical query catalog (queries + DuckDB oracles)
    streaming   — incremental processing-log layer (SURVEY §2.10)
"""

__version__ = "0.1.0"
