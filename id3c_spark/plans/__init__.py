"""Analytical query catalog: Spark plans + DuckDB oracle SQL (SURVEY §2)."""
