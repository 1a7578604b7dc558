"""Unit tests for the scalar function library (SURVEY §2.8)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from id3c_spark.functions import (
    age_in_years,
    barcode_slices,
    citext_eq,
    hamming_distance,
    hamming_distance_lte,
    hstore_concat,
    iso_week_label,
    json_merge_udf,
    parse_hstore,
)


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_hamming_distance(spark):
    assert one(spark, hamming_distance(F.lit("deadbeef"), F.lit("deadbeef"))) == 0
    assert one(spark, hamming_distance(F.lit("deadbeef"), F.lit("deadbeaf"))) == 1
    assert one(spark, hamming_distance(F.lit("aaaaaaaa"), F.lit("bbbbbbbb"))) == 8
    # length mismatch → null (reference raises; we signal with null)
    assert one(spark, hamming_distance(F.lit("abc"), F.lit("abcd"))) is None


def test_hamming_lte(spark):
    assert one(spark, hamming_distance_lte(F.lit("abcd1234"), F.lit("abcd1299"), 2)) is True
    assert one(spark, hamming_distance_lte(F.lit("abcd1234"), F.lit("abcd1999"), 2)) is False


def test_barcode_slices(spark):
    # reference barcode_slices.sql: positional 2-grams keyed '{i}__{gram}'
    got = one(spark, barcode_slices(F.lit("abcd")))
    assert got == ["1__ab", "2__bc", "3__cd"]


def test_citext(spark):
    assert one(spark, citext_eq(F.lit("HMC"), F.lit("hmc"))) is True


def test_iso_week_boundaries(spark):
    # Postgres to_char(IYYY-"W"IW) parity at ISO year boundaries
    cases = {
        "2019-12-29": "2019-W52",  # Sunday of ISO week 52/2019
        "2019-12-30": "2020-W01",  # Monday starts ISO 2020
        "2020-01-01": "2020-W01",
        "2021-01-01": "2020-W53",  # 2020 has 53 ISO weeks
        "2021-01-04": "2021-W01",
        "2016-01-01": "2015-W53",
    }
    for day, expect in cases.items():
        assert one(spark, iso_week_label(F.lit(day))) == expect, day


def test_age_in_years(spark):
    # age_conversion.sql: round(years + months/12, 2)
    assert one(spark, age_in_years(F.lit(25))) == 2.08
    assert one(spark, age_in_years(F.lit(0))) == 0.0
    assert one(spark, age_in_years(F.lit(1080))) == 90.0


def test_hstore_parse_concat(spark):
    m = one(spark, parse_hstore(F.lit("Country => US, State => WA")))
    assert m == {"country": "us", "state": "wa"}
    merged = one(
        spark,
        hstore_concat(
            F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2")),
            F.create_map(F.lit("b"), F.lit("9")),
        ),
    )
    assert merged == {"a": "1", "b": "9"}  # right-biased (LAST_WIN)


def test_json_merge(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "nested": {"x": 1}}', '{"b": 2, "nested": {"y": 2}}'), (None, '{"k": 1}')],
        "l string, r string",
    )
    out = [r.m for r in df.select(json_merge_udf("l", "r").alias("m")).collect()]
    # top-level-only merge: nested object replaced wholesale, right biased
    assert json.loads(out[0]) == {"a": 1, "b": 2, "nested": {"y": 2}}
    assert json.loads(out[1]) == {"k": 1}
