"""PII detection / redaction for corpus curation (north-star family).

A large-scale training-data pipeline scrubs personal identifiers before
anything else sees the text. This is the distributed generalization of
the reference's de-identification step (lib/id3c/cli/command/
de_identify.py hashes whole columns; here we find and mask spans inside
free text).

Everything is JVM-side regexp expressions — regexp_count /
regexp_extract_all / regexp_replace — so detection and redaction run
inside whole-stage codegen at full scan speed with no Python in the hot
path; at 100 TB this is a single pushdown-friendly projection over the
text column (no shuffle, no UDF). Patterns are restricted to the
regex subset Java and RE2/DuckDB interpret identically, so the DuckDB
oracle replays the exact semantics (see plans/queries.py:pii_redact_docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied first-to-last during redaction. Order matters only for
# overlapping matches; these patterns are mutually exclusive on word
# boundaries, but the oracle mirrors the same order regardless.
PII_PATTERNS: list[tuple[str, str]] = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
]


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match-count columns (aliased n_<kind>)."""
    return [
        F.regexp_count(text, F.lit(pattern)).alias(f"n_{kind}")
        for kind, pattern in PII_PATTERNS
    ]


def redact_pii(text: Column) -> Column:
    """Mask every PII span with ``<KIND>`` placeholders, fixed kind order."""
    out = text
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{kind.upper()}>")
    return out


def pii_findings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exploded findings: one row per (id, kind, match, match ordinal).

    The ordinal disambiguates repeated identical matches so downstream
    audits can count occurrences exactly.
    """
    text = F.col(text_col)
    per_kind = F.array(
        *[
            F.struct(
                F.lit(kind).alias("kind"),
                F.regexp_extract_all(text, F.lit(pattern), 0).alias("matches"),
            )
            for kind, pattern in PII_PATTERNS
        ]
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(per_kind).alias("k"))
        .select("id", F.col("k.kind").alias("kind"), F.posexplode("k.matches").alias("ord0", "match"))
        .select("id", "kind", (F.col("ord0") + 1).cast("int").alias("ord"), "match")
    )


def scrub_documents(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Corpus-curation stage: redacted text + per-kind counts + a total.

    Keeps the original row shape (redaction in place unless ``out_col``
    given) so it drops into plans/curation.curate ahead of the quality
    gate.
    """
    text = F.col(text_col)
    cols = {(out_col or text_col): redact_pii(text)}
    for kind, pattern in PII_PATTERNS:
        cols[f"n_{kind}"] = F.regexp_count(text, F.lit(pattern))
    cols["n_pii"] = sum(
        (F.regexp_count(text, F.lit(p)) for _, p in PII_PATTERNS), F.lit(0)
    )
    return df.withColumns(cols)
