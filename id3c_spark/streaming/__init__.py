"""Incremental / streaming layer (SURVEY §2.10)."""
