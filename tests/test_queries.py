"""Catalog smoke + oracle verification at sf0.001 (the driver's full check
runs at sf0.01; tools/verify_local.py mirrors it for development)."""

from __future__ import annotations

import duckdb
import pytest

from id3c_spark.plans.queries import all_oracles, all_queries
from tools.verify_local import TABLES, compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = all_queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracle = all_oracles().get(name)
    if oracle is None:
        assert sdf is not None  # rows-only contract: runs with stable schema
        return
    ddf = duck.sql(oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems[:3]


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
