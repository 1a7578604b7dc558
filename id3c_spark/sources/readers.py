"""Source readers with id3c semantics (SURVEY §2.1).

  - NDJSON receiving load: copy_from_ndjson parity
    (lib/id3c/db/session.py:157-188) — exact document text preserved,
    sequential ids in file order.
  - CSV/TSV all-string scan: load_file_as_dataframe parity
    (lib/id3c/cli/io/pandas.py:48-74) — dtype=string, no NA inference,
    trim + ''/'na' → null normalization (manifest.py:331-336).
  - FASTQ directory scan: sequence_read_set.py:46-88 — glob *.fastq.gz,
    regex-capture the sample id, group urls per sample.
  - Excel workbook scan: gated stub (openpyxl not in this image); the
    Spark-side contract (all-string schema) is the same as CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_ndjson_receiving(spark: SparkSession, path: str) -> DataFrame:
    """One JSON document per line → (id, document, received). Document text
    is kept verbatim (receiving tables use ``json`` not ``jsonb`` to
    preserve the exact text, receiving/enrollment.sql:11-13).

    Scale note: row_number over a global window is a single-partition
    bottleneck; ids only need to be unique + monotone per file, so at scale
    switch to (file offset, partition id) keys — kept simple here because
    receiving appends are batched small.
    """
    w = Window.orderBy(F.monotonically_increasing_id())
    return (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(
            F.row_number().over(w).cast("long").alias("id"),
            F.col("value").alias("document"),
            F.current_timestamp().alias("received"),
        )
    )


def read_csv_all_strings(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True,
) -> DataFrame:
    """All-columns-string CSV read with the reference's null normalization:
    trim, then '' and 'na' (case-insensitive) → null."""
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    for c in df.columns:
        v = F.trim(F.col(c))
        df = df.withColumn(c, F.when(F.lower(v).isin("", "na"), None).otherwise(v))
    return df


def fastq_read_sets(
    spark: SparkSession,
    directory: str,
    sample_pattern: str = r".*/(\d+)_[^/]*\.fastq\.gz$",
) -> DataFrame:
    """Group FASTQ urls per regex-captured sample → (sample, urls[]),
    urls sorted for the unique-to-one-set invariant check."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.fastq.gz").select(
        F.col("path").alias("url")
    )
    return (
        files.withColumn("sample", F.regexp_extract("url", sample_pattern, 1))
        .filter(F.col("sample") != "")
        .groupBy("sample")
        .agg(F.array_sort(F.collect_list("url")).alias("urls"))
    )


def select_columns_glob(df: DataFrame, *patterns: str) -> DataFrame:
    """Column projection by shell glob, case-insensitive — select_column(s)
    parity (manifest.py:471-510). Driver-side metadata op; raises if a
    pattern matches nothing (the reference errors the same way)."""
    import fnmatch

    keep: list[str] = []
    for pattern in patterns:
        hits = [c for c in df.columns
                if fnmatch.fnmatchcase(c.lower(), pattern.lower()) and c not in keep]
        if not hits:
            raise KeyError(f"no column matches {pattern!r}")
        keep.extend(hits)
    return df.select(*keep)


def read_excel_all_strings(spark: SparkSession, path: str, sheet: str | None = None) -> DataFrame:
    """Excel manifest scan (manifest.py:278-336). openpyxl/xlrd are not in
    this image; when available the contract matches read_csv_all_strings."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:
        raise NotImplementedError(
            "Excel reading needs openpyxl (not in this image); convert the "
            "workbook to CSV and use read_csv_all_strings"
        ) from e
    pdf = pd.read_excel(path, sheet_name=sheet or 0, dtype=str, na_filter=False)
    return spark.createDataFrame(pdf.astype(str))
