"""De-identification (reference: lib/id3c/cli/command/de_identify.py:91-139).

generate_hash(identifier, secret) = sha256(identifier + secret) hex —
golden vector from the reference doctest (de_identify.py:95-96):
generate_hash("foo", "abadsecret")
  = '72a79a0f21b20b9c7d0a117addc0d917bcda3065c9c8329aea77b11cb39096c8'.

Pure sha2 column expression — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generate_hash(identifier: Column, secret: str) -> Column:
    return F.sha2(F.concat(identifier, F.lit(secret)), 256)


def deidentify(
    df: DataFrame,
    columns: list[str],
    secret: str,
    out_col: str = "hash",
    drop: bool = True,
) -> DataFrame:
    """Replace identifying columns with one stable hash.

    Exact reference semantics (de_identify.py:58-60): values joined with a
    single space IN COLUMN ORDER (``' '.join``, nulls as empty strings), and
    a NULL hash when the joined value is the empty string (``generate_hash(x)
    if x else None``) — so hashes line up with ones produced by the
    reference pipeline for cross-system linkage."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in columns]
    joined = F.concat_ws(" ", *parts)
    h = F.when(joined == F.lit(""), F.lit(None).cast("string")).otherwise(
        generate_hash(joined, secret)
    )
    out = df.withColumn(out_col, h)
    return out.drop(*columns) if drop else out
