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
    # deny-by-default: unregistered views fail closed (views.sql revokes
    # from public before granting — a missing ACL entry is a missing grant)
    assert not access.can_select("unlisted_view", [])
    assert not access.can_select("unlisted_view", ["reporter"])
    # explicit PUBLIC marker is the only way to be world-readable
    assert access.can_select("sample_with_best_available_encounter_data_v1", [])
    with pytest.raises(PermissionError):
        access.check_select("incidence_model_observation_v2", ["reporter"])


def test_user_registry(tmp_path):
    """user.py / db/__init__.py:104-153 parity: create, grant, reset,
    name-ordered listing with sorted roles; access layer integration."""
    from click.testing import CliRunner

    from id3c_spark.cli import cli
    from id3c_spark.users import NoSuchUserError, UserExistsError, UserRegistry

    reg = UserRegistry(str(tmp_path / "users.json"))
    reg.create_user("ada", comment="modeler")
    reg.grant_roles("ada", ["incidence-modeler"])
    reg.grant_roles("ada", ["reporter", "incidence-modeler"])   # idempotent union
    reg.create_user("bob")
    reg.grant_roles("bob", [])                                   # no-op like the reference
    assert reg.list_users() == [
        {"name": "ada", "description": "modeler", "roles": ["incidence-modeler", "reporter"]},
        {"name": "bob", "description": None, "roles": []},
    ]
    with pytest.raises(UserExistsError):
        reg.create_user("ada")
    with pytest.raises(NoSuchUserError):
        reg.grant_roles("ghost", ["reporter"])

    pw = reg.reset_password("ada")
    assert reg.check_password("ada", pw) and not reg.check_password("ada", "wrong")
    assert pw not in (tmp_path / "users.json").read_text()       # only digest stored

    # granted roles drive the ACL layer
    assert access.can_select("incidence_model_observation_v2", reg.roles_of("ada"))
    assert not access.can_select("incidence_model_observation_v2", reg.roles_of("bob"))

    # CLI surface (user create --role / ls)
    r = CliRunner()
    path = str(tmp_path / "cli_users.json")
    out = r.invoke(cli, ["user", "create", "carol", "--registry", path,
                         "--role", "reporter", "--generate-password"])
    assert out.exit_code == 0 and "Password is " in out.output
    ls = r.invoke(cli, ["user", "ls", "--registry", path])
    assert ls.exit_code == 0 and "carol" in ls.output and "reporter" in ls.output


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


def test_smartystreets_provider_offline():
    """US Street REST contract (reference geocode.py:313-427): candidates=1,
    match=invalid, first-candidate parse, empty result → None."""
    import json as _json
    from urllib.parse import parse_qs, urlparse

    seen = {}

    def transport(url):
        u = urlparse(url)
        seen.update({k: v[0] for k, v in parse_qs(u.query).items()}, path=u.path)
        if "EMPTY" in seen["street"]:
            return b"[]"
        return _json.dumps([{
            "delivery_line_1": "123 MAIN ST",
            "last_line": "SEATTLE WA 98101-0000",
            "metadata": {"latitude": 47.60358, "longitude": -122.32945},
        }]).encode()

    provider = geocode.smartystreets_provider("id", "tok", transport=transport)
    got = provider("123 main st, seattle, wa")
    assert seen["path"] == "/street-address"
    assert (seen["candidates"], seen["match"]) == ("1", "invalid")
    assert (seen["auth-id"], seen["auth-token"]) == ("id", "tok")
    assert got == {
        "std_address": "123 MAIN ST, SEATTLE, WA",
        "lat": 47.60358,
        "lng": -122.32945,
        "canonicalized_address": "123 MAIN ST SEATTLE WA 98101-0000",
    }
    assert provider("EMPTY st") is None
    assert provider("") is None


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


def test_geocode_distributed_runs_provider_on_executors(spark, tmp_path):
    """geocode_distributed: provider calls happen in executor workers (not
    the driver), once per distinct address per worker — proven by a
    counting fake that logs (pid, address) to disk from wherever it runs."""
    import os

    log_dir = tmp_path / "calls"
    log_dir.mkdir()
    log_path = str(log_dir)
    driver_pid = os.getpid()

    def counting_provider(addr):
        import os as _os
        import uuid as _uuid

        with open(f"{log_path}/{_uuid.uuid4().hex}", "w") as f:
            f.write(f"{_os.getpid()}\t{addr}")
        from id3c_spark.geocode import fake_geocoder
        return fake_geocoder(addr)

    df = spark.createDataFrame(
        [("123 Main St", "Seattle", "WA", f"x{i}") for i in range(10)]
        + [("456 Pine St", "Seattle", "WA", "y0")],
        "Street string, City string, State string, note string",
    )
    out = geocode.geocode_distributed(
        df, counting_provider, ["Street", "City", "State"], partitions=4
    ).collect()
    assert len(out) == 11
    mains = [r for r in out if r.note.startswith("x")]
    assert all(r.lat == mains[0].lat is not None for r in mains)

    entries = [
        open(os.path.join(log_path, name)).read().split("\t")
        for name in os.listdir(log_path)
    ]
    # one call per distinct address (per worker) — never per row
    assert len(entries) == 2
    assert {addr for _, addr in entries} == {
        "123 Main St, Seattle, WA", "456 Pine St, Seattle, WA"
    }
    # and the calls ran in executor worker processes, not the driver
    assert all(int(pid) != driver_pid for pid, _ in entries)
