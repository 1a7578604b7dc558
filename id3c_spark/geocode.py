"""Geocoding adapter (reference: lib/id3c/cli/command/geocode.py).

The reference calls SmartyStreets per address with a pickled TTL cache
(lib/id3c/cli/command/__init__.py:221-279). The external service is
pluggable here; the default provider is a deterministic fake (no network
in this image) so the full pipeline — cache, batching, output columns
std_address/lat/lng/canonicalized_address — is real and testable.

Scale: lookups run driver-side over the DISTINCT address set only (the
cache is a driver artifact, like the reference's pickle), then join back
to the full frame — geocoding 10^9 rows only ever calls the provider for
the unique addresses.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDRESS_COLS = ["Street", "Street2", "City", "State", "ZipCode"]


def fake_geocoder(address: str) -> dict | None:
    """Deterministic stand-in for SmartyStreets: md5-derived lat/lng in
    plausible ranges; empty/short addresses return None (no geocode)."""
    if not address or len(address.strip()) < 5:
        return None
    h = hashlib.md5(address.lower().encode()).hexdigest()
    lat = 45.0 + int(h[:6], 16) / 0xFFFFFF * 4.0       # 45..49
    lng = -125.0 + int(h[6:12], 16) / 0xFFFFFF * 8.0   # -125..-117
    return {
        "std_address": address.strip().upper(),
        "lat": round(lat, 6),
        "lng": round(lng, 6),
        "canonicalized_address": " ".join(address.upper().split()),
    }


def smartystreets_provider(
    auth_id: str,
    auth_token: str,
    transport: Callable[[str], bytes] | None = None,
    api: str = "https://us-street.api.smarty.com",
) -> Callable[[str], dict | None]:
    """Real SmartyStreets US Street provider (reference geocode.py:313-427
    via the vendor SDK; this speaks the same documented REST endpoint with
    stdlib urllib). Mirrors the reference lookup: candidates=1, the most
    permissive ``match=invalid`` strategy (geocode.py:398-400), and the
    first-candidate parse — ``delivery_line_1 + ' ' + last_line`` as the
    canonicalized address, lat/lng from metadata (geocode.py:403-427).
    *transport* is injectable so tests stay offline."""
    import json
    import urllib.parse
    import urllib.request

    def default_transport(url: str) -> bytes:
        with urllib.request.urlopen(url) as resp:
            return resp.read()

    fetch = transport or default_transport

    def provider(address: str) -> dict | None:
        if not address or not address.strip():
            return None
        params = urllib.parse.urlencode({
            "auth-id": auth_id,
            "auth-token": auth_token,
            "street": address,
            "candidates": 1,
            "match": "invalid",
        })
        results = json.loads(fetch(f"{api}/street-address?{params}"))
        if not results:
            return None
        first = results[0]
        meta = first.get("metadata", {})
        canonical = " ".join(
            p for p in [first.get("delivery_line_1"), first.get("last_line")] if p
        )
        return {
            "std_address": address.strip().upper(),
            "lat": meta.get("latitude"),
            "lng": meta.get("longitude"),
            "canonicalized_address": canonical,
        }

    return provider


class PickleCache:
    """TTL'd pickled cache (command/__init__.py:221-279 parity)."""

    def __init__(self, path: str, ttl_seconds: float = 30 * 86400):
        self.path = path
        self.ttl = ttl_seconds
        self.data: dict[str, tuple[float, dict | None]] = {}
        if os.path.exists(path):
            with open(path, "rb") as f:
                self.data = pickle.load(f)

    def get(self, key: str):
        hit = self.data.get(key)
        if hit and (time.time() - hit[0]) < self.ttl:
            return True, hit[1]
        return False, None

    def put(self, key: str, value) -> None:
        self.data[key] = (time.time(), value)

    def save(self) -> None:
        with open(self.path, "wb") as f:
            pickle.dump(self.data, f)


def geocode(
    df: DataFrame,
    cache_path: str,
    provider: Callable[[str], dict | None] = fake_geocoder,
    address_cols: list[str] | None = None,
) -> DataFrame:
    """Add std_address/lat/lng/canonicalized_address (geocode.py:55-109).

    Distinct addresses → cache/provider on the driver → broadcast join
    back; passthrough columns preserved.
    """
    cols = [c for c in (address_cols or ADDRESS_COLS) if c in df.columns]
    spark = df.sparkSession
    key = F.concat_ws(", ", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    keyed = df.withColumn("__addr", key)

    distinct = [r["__addr"] for r in keyed.select("__addr").distinct().collect()]
    cache = PickleCache(cache_path)
    rows = []
    for addr in distinct:
        hit, value = cache.get(addr)
        if not hit:
            value = provider(addr)
            cache.put(addr, value)
        rows.append((
            addr,
            (value or {}).get("std_address"),
            (value or {}).get("lat"),
            (value or {}).get("lng"),
            (value or {}).get("canonicalized_address"),
        ))
    cache.save()
    lookup = spark.createDataFrame(
        rows, "__addr string, std_address string, lat double, lng double, canonicalized_address string"
    )
    return keyed.join(F.broadcast(lookup), "__addr", "left").drop("__addr")


#: Per-worker-process geocode memo for geocode_distributed. Python workers
#: are reused across tasks (spark.python.worker.reuse default), so the
#: module global persists on each executor — repeated addresses cost one
#: provider call per worker, not per row.
_WORKER_CACHE: dict[str, dict | None] = {}


def geocode_distributed(
    df: DataFrame,
    provider: Callable[[str], dict | None] = fake_geocoder,
    address_cols: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side batch geocoding — the 100×-scale path.

    geocode() above collects DISTINCT addresses to the driver (faithful
    to the reference's external-API pattern, geocode.py:55-109, and fine
    at reference scale); a national-scale address batch would bottleneck
    and OOM there. Here the distinct-address relation stays distributed:
    it shuffles across *partitions* tasks and each task calls the
    provider only for addresses missing from its worker-process memo
    (_WORKER_CACHE), then the results join back on the address key. The
    driver never materializes an address list; provider concurrency =
    partitions, the knob to respect the provider's rate limit.

    The *provider* callable ships to executors (pickled), so it must be
    self-contained — e.g. smartystreets_provider built from env-var
    credentials, or any callable closing over plain config.
    """
    import pandas as pd

    cols = [c for c in (address_cols or ADDRESS_COLS) if c in df.columns]
    key = F.concat_ws(", ", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    keyed = df.withColumn("__addr", key)
    distinct = keyed.select("__addr").distinct()
    if partitions:
        distinct = distinct.repartition(partitions, "__addr")

    def run(batches):
        cache = _WORKER_CACHE
        for pdf in batches:
            out = []
            for addr in pdf["__addr"]:
                if addr in cache:
                    value = cache[addr]
                else:
                    value = cache[addr] = provider(addr)
                v = value or {}
                out.append((
                    addr, v.get("std_address"), v.get("lat"), v.get("lng"),
                    v.get("canonicalized_address"),
                ))
            yield pd.DataFrame(out, columns=[
                "__addr", "std_address", "lat", "lng", "canonicalized_address"
            ])

    lookup = distinct.mapInPandas(
        run,
        "__addr string, std_address string, lat double, lng double, "
        "canonicalized_address string",
    )
    return keyed.join(lookup, "__addr", "left").drop("__addr")
