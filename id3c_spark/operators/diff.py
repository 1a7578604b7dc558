"""Content-hash diff — manifest diff parity (SURVEY §2.7).

Reference: ``manifest diff`` computes B ∖ A by deep content hash of each
record *ignoring the _provenance key* (lib/id3c/cli/command/manifest.py:
396-436, 614-619, DeepHash), optionally case-insensitively.

Spark shape: canonicalize → sha2(to_json(struct)) → left_anti join on the
hash. The anti-join shuffles only 64-hex-char hashes, not full records —
at 100 TB this is the cheapest possible diff (hash column pruned scan on
both sides, hash-partitioned anti join, AQE-broadcast when A is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash(
    df: DataFrame,
    ignore: Sequence[str] = (),
    case_insensitive: bool = False,
) -> Column:
    """Order-independent record hash over all columns except ``ignore``.

    Columns sorted by name (the reference's DeepHash is key-order
    independent); values serialized via to_json so nested types hash
    structurally.
    """
    cols = sorted(c for c in df.columns if c not in set(ignore))
    payload = F.to_json(F.struct(*[F.col(c).alias(c) for c in cols]))
    if case_insensitive:
        payload = F.lower(payload)
    return F.sha2(payload, 256)


def diff_new_records(
    new: DataFrame,
    old: DataFrame,
    ignore: Sequence[str] = ("_provenance",),
    case_insensitive: bool = False,
) -> DataFrame:
    """Records of ``new`` whose content hash is absent from ``old``."""
    nh = new.withColumn("__h", content_hash(new, ignore, case_insensitive))
    oh = old.select(content_hash(old, ignore, case_insensitive).alias("__h")).distinct()
    return nh.join(oh, "__h", "left_anti").drop("__h")
