"""RLS access filter, ACL checks, materialized refresh, geocode cache."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from id3c_spark import access, geocode, refresh
from id3c_spark.sources.store import ParquetTable


def test_rls_filter(spark):
    sample = spark.createDataFrame(
        [(1, None), (2, "clia"), (3, "restricted")],
        "sample_id long, access_role string",
    )
    public = access.rls_filter(sample, [])
    assert {r.sample_id for r in public.collect()} == {1}
    clia = access.rls_filter(sample, ["CLIA"])
    assert {r.sample_id for r in clia.collect()} == {1, 2}


def test_view_acl():
    assert access.can_select("presence_absence_result_v1", ["reporter"])
    assert not access.can_select("incidence_model_observation_v2", ["reporter"])
    assert access.can_select("unlisted_view", [])       # no ACL = public
    with pytest.raises(PermissionError):
        access.check_select("incidence_model_observation_v2", ["reporter"])


def test_refresh_atomic(spark, tmp_path):
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(len(calls),)], "v long")

    v1 = refresh.refresh_materialized_view(spark, "gold1", str(tmp_path), compute)
    v2 = refresh.refresh_materialized_view(spark, "gold1", str(tmp_path), compute)
    assert (v1, v2) == (1, 2)
    tbl = ParquetTable(spark, str(tmp_path / "gold1"))
    assert tbl.read().collect()[0].v == 2              # readers see the new version


def test_geocode_cache(spark, tmp_path):
    df = spark.createDataFrame(
        [("123 Main St", "Seattle", "WA", "x1"),
         ("123 Main St", "Seattle", "WA", "x2"),       # duplicate address
         ("", "", "", "x3")],                           # ungeocodable
        "Street string, City string, State string, note string",
    )
    calls = []

    def provider(addr):
        calls.append(addr)
        return geocode.fake_geocoder(addr)

    cache = str(tmp_path / "cache.pickle")
    out = geocode.geocode(df, cache, provider, ["Street", "City", "State"]).collect()
    by_note = {r.note: r for r in out}
    assert by_note["x1"].lat == by_note["x2"].lat is not None
    assert by_note["x3"].lat is None
    assert len(calls) == 2                              # distinct addresses only

    # second run: all answers served from the pickled cache
    calls.clear()
    geocode.geocode(df, cache, provider, ["Street", "City", "State"]).collect()
    assert calls == []
