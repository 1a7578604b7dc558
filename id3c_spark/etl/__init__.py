"""Warehouse ETL subsystem (SURVEY §2.9, §3.1).

The reference processes receiving documents row-at-a-time in Python with
per-record savepoints; here each ETL is a handful of set-oriented Spark
plans: parse-all → validate/split → staged entity DataFrames → ordered
MERGEs → status-table append. Idempotent MERGE + the incremental
processing-log replace transactional atomicity (SURVEY §2.10).
"""
