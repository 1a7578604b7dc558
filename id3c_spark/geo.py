"""Geospatial subsystem (SURVEY §2.8 geo; reference lib/id3c/cli/command/location.py).

The reference uses PostGIS (st_contains point-in-polygon lookup with
``order by identifier limit 1`` tie-break, location.py:440-477). No
geo libraries ship in this image, so geometry is WKT strings (SURVEY §1.2
mapping) and containment is:

  1. bbox prefilter — JVM-side comparisons against precomputed polygon
     bounds (the cheap blocking step, analogous to PostGIS's index scan);
  2. exact ray-casting refine in an Arrow-batched pandas UDF.

Scale: the polygons (census tracts, ~10^5 rows max) broadcast; the point
side streams through the bbox filter without a shuffle; only bbox-hit
pairs reach Python. For planet-scale joins swap the bbox for an H3/geohash
cover + equi-join — the refine step is unchanged.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from id3c_spark.operators.topk import distinct_on

_WKT_POLY = re.compile(r"POLYGON\s*\(\((.*?)\)\)", re.I | re.S)


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Minimal WKT POLYGON parser (outer ring only — the fixture/test
    geometries are simple rings; MULTIPOLYGON support via first polygon)."""
    if not wkt:
        return []
    m = _WKT_POLY.search(wkt)
    if not m:
        return []
    pts = []
    for pair in m.group(1).split(","):
        xs = pair.split()
        if len(xs) >= 2:
            pts.append((float(xs[0]), float(xs[1])))
    return pts


def point_in_ring(lng: float, lat: float, ring: list[tuple[float, float]]) -> bool:
    """Ray casting; boundary points count as inside (st_covers-ish)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lng < xin:
                inside = not inside
            elif lng == xin:
                return True
    return inside


@F.pandas_udf(T.BooleanType())
def _contains_udf(polygon_wkt: pd.Series, lng: pd.Series, lat: pd.Series) -> pd.Series:
    out = []
    cache: dict[str, list] = {}
    for wkt, x, y in zip(polygon_wkt, lng, lat):
        if wkt is None or pd.isna(x) or pd.isna(y):
            out.append(False)
            continue
        ring = cache.get(wkt)
        if ring is None:
            ring = cache[wkt] = parse_wkt_polygon(wkt)
        out.append(point_in_ring(float(x), float(y), ring) if ring else False)
    return pd.Series(out)


def with_bbox(locations: DataFrame, polygon_col: str = "polygon_wkt") -> DataFrame:
    """Precompute polygon bounds as plain columns (one pass, stored with
    the dimension) so the join prefilter stays JVM-side."""
    @F.pandas_udf("struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    def bbox(wkt: pd.Series) -> pd.DataFrame:
        rows = []
        for w in wkt:
            ring = parse_wkt_polygon(w) if w else []
            if ring:
                xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
                rows.append((min(xs), min(ys), max(xs), max(ys)))
            else:
                rows.append((None, None, None, None))
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    return locations.withColumn("__bbox", bbox(F.col(polygon_col)))


def lookup_tract(
    points: DataFrame,
    locations: DataFrame,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """location.py:440-477 parity: for each point, the containing location's
    identifier — deterministic tie-break ``order by identifier limit 1``.
    Points matching nothing keep a null tract_identifier."""
    locs = with_bbox(locations).select(
        F.col("identifier").alias("tract_identifier"), "polygon_wkt", "__bbox"
    )
    pts = points.withColumn("__pid", F.monotonically_increasing_id())
    cand = pts.join(
        F.broadcast(locs),
        (F.col(lng_col) >= F.col("__bbox.xmin")) & (F.col(lng_col) <= F.col("__bbox.xmax"))
        & (F.col(lat_col) >= F.col("__bbox.ymin")) & (F.col(lat_col) <= F.col("__bbox.ymax")),
        "inner",
    ).filter(_contains_udf(F.col("polygon_wkt"), F.col(lng_col), F.col(lat_col)))
    best = distinct_on(cand, ["__pid"], [F.col("tract_identifier").asc()])
    return (
        pts.join(best.select("__pid", "tract_identifier"), "__pid", "left")
        .drop("__pid", "polygon_wkt", "__bbox")
    )
