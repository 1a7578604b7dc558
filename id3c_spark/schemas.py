"""StructTypes for the warehouse + receiving data model (SURVEY §1).

Type-mapping decisions (reference citations → Spark):
  - ``interval`` age, month precision (schema/deploy/warehouse/encounter/age.sql:5-8)
    → ``age_months INT`` (+ derived years via functions.age.age_in_years).
  - ``int4range`` / ``intervalrange`` age bins (schema/deploy/shipping/age-bin-v2.sql:7-14)
    → STRUCT<lo_months INT, hi_months INT>, null hi = unbounded.
  - ``hstore`` (warehouse/location.sql:14) → MapType(String, String).
  - ``ltree`` lineage (warehouse/organism.sql:11) → dot-path StringType.
  - ``citext`` → StringType, compared with lower() (see functions.strings).
  - ``json``/``jsonb`` document & details columns → raw StringType, parsed
    on demand with from_json/get_json_object (keeps exact document text,
    matching receiving's ``json`` columns — receiving/enrollment.sql:11-13).
  - PostGIS geometry (warehouse/location.sql:15-17) → WKT StringType.
  - ``uuid`` → StringType.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
I = T.IntegerType()
L = T.LongType()
B = T.BooleanType()
TS = T.TimestampType()
D = T.DateType()
MAP_SS = T.MapType(S, S)


# ---------------------------------------------------------------------------
# Warehouse entities (SURVEY §1.3; schema/deploy/warehouse/*.sql)
# ---------------------------------------------------------------------------

INDIVIDUAL = T.StructType([
    _f("individual_id", L, False),
    _f("identifier", S, False),          # unique
    _f("sex", S),                        # in ('male','female','other') or null
    _f("details", S),                    # JSON
])

SITE = T.StructType([
    _f("site_id", L, False),
    _f("identifier", S, False),          # unique case-insensitively (site.sql:12-14)
    _f("details", S),
])

ENCOUNTER = T.StructType([
    _f("encounter_id", L, False),
    _f("identifier", S, False),
    _f("individual_id", L, False),
    _f("site_id", L, False),
    _f("encountered", TS, False),
    _f("age_months", I),                 # interval month-precision → months int
    _f("details", S),
])

SAMPLE = T.StructType([
    _f("sample_id", L, False),
    _f("identifier", S),                 # nullable; coalesce(identifier,
    _f("collection_identifier", S),      #   collection_identifier) not null
    _f("encounter_id", L),
    _f("collected", D),
    _f("details", S),
    _f("access_role", S),                # RLS → filtered views
])

TARGET = T.StructType([
    _f("target_id", L, False),
    _f("identifier", S, False),
    _f("control", B, False),
])

ORGANISM = T.StructType([
    _f("organism_id", L, False),
    _f("lineage", S, False),             # ltree → dot path
    _f("identifiers", MAP_SS),           # hstore
    _f("details", S),
])

PRESENCE_ABSENCE = T.StructType([
    _f("presence_absence_id", L, False),
    _f("identifier", S, False),
    _f("sample_id", L, False),
    _f("target_id", L, False),
    _f("present", B),                    # three-state: true/false/null
    _f("details", S),
])

LOCATION = T.StructType([
    _f("location_id", L, False),
    _f("identifier", S, False),
    _f("scale", S, False),               # (scale, identifier) unique
    _f("hierarchy", MAP_SS),
    _f("point_wkt", S),
    _f("polygon_wkt", S),
    _f("simplified_polygon_wkt", S),
    _f("details", S),
])

ENCOUNTER_LOCATION = T.StructType([
    _f("encounter_id", L, False),
    _f("relation", S, False),            # citext PK component
    _f("location_id", L, False),
    _f("details", S),
])

ENCOUNTER_LOCATION_RELATION = T.StructType([
    _f("relation", S, False),
    _f("priority", I),                   # nulls last ordering
])

IDENTIFIER_SET = T.StructType([
    _f("identifier_set_id", L, False),
    _f("name", S, False),
    _f("use", S),
    _f("description", S),
])

IDENTIFIER = T.StructType([
    _f("uuid", S, False),
    _f("barcode", S, False),             # 8 chars = suffix of uuid
    _f("identifier_set_id", L, False),
    _f("generated", TS, False),
])

KIT = T.StructType([
    _f("kit_id", L, False),
    _f("identifier", S, False),
    _f("encounter_id", L),
    _f("rdt_sample_id", L),
    _f("utm_sample_id", L),
    _f("details", S),
])

SEQUENCE_READ_SET = T.StructType([
    _f("sequence_read_set_id", L, False),
    _f("sample_id", L, False),
    _f("urls", T.ArrayType(S, False)),   # non-empty, no nulls, unique-to-set
    _f("details", S),
])

CONSENSUS_GENOME = T.StructType([
    _f("consensus_genome_id", L, False),
    _f("sample_id", L, False),
    _f("organism_id", L, False),
    _f("sequence_read_set_id", L),
    _f("details", S),
])

GENOMIC_SEQUENCE = T.StructType([
    _f("genomic_sequence_id", L, False),
    _f("identifier", S, False),
    _f("segment", S, False),
    _f("seq", S, False),
    _f("consensus_genome_id", L, False),
    _f("details", S),
])

AGE_BIN = T.StructType([                 # intervalrange → lo/hi months struct
    _f("lo_months", I, False),
    _f("hi_months", I),                  # null = unbounded
])


# ---------------------------------------------------------------------------
# Receiving (append-only document log; schema/deploy/receiving/*.sql)
# All receiving tables share one shape: identity id, exact document text,
# received timestamp. processing_log is replaced by the status table in
# streaming/incremental.py (SURVEY §2.10).
# ---------------------------------------------------------------------------

RECEIVING = T.StructType([
    _f("id", L, False),
    _f("document", S, False),            # exact JSON text preserved
    _f("received", TS, False),
])

RECEIVING_TABLES = (
    "enrollment", "presence_absence", "fhir", "manifest", "clinical",
    "longitudinal", "consensus_genome", "sequence_read_set", "redcap_det",
)

PROCESSING_LOG = T.StructType([          # per-row ETL status (audit parity)
    _f("table_name", S, False),
    _f("record_id", L, False),
    _f("etl", S, False),
    _f("revision", I, False),
    _f("status", S, False),              # 'processed' | 'skipped' | 'error'
    _f("detail", S),
    _f("timestamp", TS, False),
])

WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    "individual": INDIVIDUAL,
    "site": SITE,
    "encounter": ENCOUNTER,
    "sample": SAMPLE,
    "target": TARGET,
    "organism": ORGANISM,
    "presence_absence": PRESENCE_ABSENCE,
    "location": LOCATION,
    "encounter_location": ENCOUNTER_LOCATION,
    "encounter_location_relation": ENCOUNTER_LOCATION_RELATION,
    "identifier_set": IDENTIFIER_SET,
    "identifier": IDENTIFIER,
    "kit": KIT,
    "sequence_read_set": SEQUENCE_READ_SET,
    "consensus_genome": CONSENSUS_GENOME,
    "genomic_sequence": GENOMIC_SEQUENCE,
}
