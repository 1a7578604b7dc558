"""Sources & sinks (SURVEY §2.1) — NDJSON/CSV readers with id3c semantics
and a copy-on-write parquet table store standing in for Delta/Iceberg."""
