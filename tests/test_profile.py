"""Unit tests for data profiling / skew diagnostics (operators/profile.py)."""

from __future__ import annotations


def test_profile_table_per_type_stats(spark):
    from id3c_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, -3.0), (None, "a", 2.0)],
        "k long, s string, x double",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}

    assert set(rows) == {"k", "s", "x"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["k"].n_nulls == 1 and rows["k"].n_distinct == 2
    assert rows["k"].min_num == 1.0 and rows["k"].max_num == 2.0
    assert rows["k"].min_str is None
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None
    assert rows["x"].min_num == -3.0 and rows["x"].max_num == 2.0


def test_profile_table_single_aggregation_job(spark):
    from id3c_spark.operators.profile import profile_table

    df = spark.range(100).selectExpr("id AS a", "CAST(id % 7 AS STRING) AS b")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # the struct-array unpivot must not duplicate the agg per column:
    # exactly one scan of the input in the plan
    assert plan.count("Scan ") + plan.count("FileScan") <= 2  # range leaf (+reuse)


def test_profile_table_approx_mode(spark):
    from id3c_spark.operators.profile import profile_table

    df = spark.range(1000).selectExpr("id AS a")
    r = profile_table(df, exact=False).collect()[0]
    assert 900 <= r.n_distinct <= 1100  # HLL estimate near truth
    assert r.n_nulls == 0 and r.min_num == 0.0 and r.max_num == 999.0


def test_heavy_hitters_order_and_ties(spark):
    from id3c_spark.operators.profile import heavy_hitters

    rows = [(1,)] * 5 + [(2,)] * 3 + [(3,)] * 3 + [(4,)] * 1
    df = spark.createDataFrame(rows, "k long")
    out = heavy_hitters(df, "k", k=3).collect()
    assert [(r.k, r.cnt, r.rank) for r in out] == [
        (1, 5, 1), (2, 3, 2), (3, 3, 3)  # tie 2 vs 3 -> key asc
    ]


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    from id3c_spark.operators.profile import cms_estimate, cms_sketch

    rows = [(i % 7,) for i in range(700)] + [(99,)] * 5
    df = spark.createDataFrame(rows, "k long")
    sketch = cms_sketch(df, "k", depth=3, width=1 << 14)
    keys = spark.createDataFrame([(i,) for i in range(7)] + [(99,), (12345,)], "k long")
    est = {r["k"]: r["n_cms"] for r in cms_estimate(sketch, keys, "k").collect()}
    exact = {i: 100 for i in range(7)} | {99: 5, 12345: 0}
    for k, n in exact.items():
        assert est[k] >= n                       # CMS guarantee
    # 9 distinct keys in 3x16384 cells: collisions are essentially
    # impossible, so the estimates are exact here
    assert est == exact


def test_cms_bounded_relation(spark):
    from id3c_spark.operators.profile import cms_sketch

    df = spark.range(0, 5000).selectExpr("id % 1000 as k")
    assert cms_sketch(df, "k", depth=3, width=64).count() <= 3 * 64
