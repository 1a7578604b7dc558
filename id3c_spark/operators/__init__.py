"""Operator library (SURVEY §2): relational + similarity + dedup operators
re-expressed as Catalyst-friendly DataFrame compositions."""
