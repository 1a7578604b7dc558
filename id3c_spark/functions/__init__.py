"""Scalar function library (SURVEY §2.8).

Every function here returns a Column built from pyspark.sql.functions
builtins so it stays inside whole-stage codegen — the reference implements
these as SQL/plpgsql functions planned by Postgres; we let Catalyst do the
same. Python/pandas UDFs appear only where genuinely unavoidable (see
json_ops.json_merge_udf).
"""

from id3c_spark.functions.strings import (  # noqa: F401
    barcode_slices,
    citext_eq,
    hamming_distance,
    hamming_distance_lte,
    iso_week_label,
)
from id3c_spark.functions.age import age_in_months, age_in_years  # noqa: F401
from id3c_spark.functions.hstore import hstore_concat, parse_hstore  # noqa: F401
from id3c_spark.functions.json_ops import (  # noqa: F401
    json_extract,
    json_merge_udf,
    json_typeof_object,
)
from id3c_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    word_shingles,
)
