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


def ring_centroid(ring: list[tuple[float, float]]) -> tuple[float, float] | None:
    """Polygon centroid via the shoelace formula (st_centroid for simple
    rings). Degenerate (zero-area) rings fall back to the vertex mean."""
    n = len(ring)
    if n == 0:
        return None
    a2 = cx = cy = 0.0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cross = x1 * y2 - x2 * y1
        a2 += cross
        cx += (x1 + x2) * cross
        cy += (y1 + y2) * cross
    if a2 == 0.0:
        return (sum(p[0] for p in ring) / n, sum(p[1] for p in ring) / n)
    return (cx / (3.0 * a2), cy / (3.0 * a2))


def point_on_surface(ring: list[tuple[float, float]]) -> tuple[float, float] | None:
    """A point guaranteed interior to the ring (st_pointonsurface):
    horizontal scanline through the bbox y-bisector (nudged off vertex
    rows), widest crossing interval's midpoint — the classic JTS
    InteriorPointArea shape."""
    if not ring:
        return None
    ys = sorted({y for _, y in ring})
    if len(ys) == 1:
        xs = [x for x, _ in ring]
        return ((min(xs) + max(xs)) / 2.0, ys[0])
    mid = (ys[0] + ys[-1]) / 2.0
    if mid in ys:
        # scan through the midpoint of the two vertex rows bracketing mid
        below = max(y for y in ys if y < mid) if any(y < mid for y in ys) else ys[0]
        above = min(y for y in ys if y > mid) if any(y > mid for y in ys) else ys[-1]
        mid = (below + above) / 2.0
    crossings = []
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > mid) != (y2 > mid):
            crossings.append((x2 - x1) * (mid - y1) / (y2 - y1) + x1)
    crossings.sort()
    best = None
    for lo, hi in zip(crossings[0::2], crossings[1::2]):
        if best is None or hi - lo > best[1] - best[0]:
            best = (lo, hi)
    if best is None:
        return ring_centroid(ring)
    return ((best[0] + best[1]) / 2.0, mid)


def default_point_from_polygon(
    locations: DataFrame,
    polygon_col: str = "polygon_wkt",
    point_col: str = "point_wkt",
) -> DataFrame:
    """Reference trigger parity (warehouse/location/triggers/
    point-default-from-polygon.sql:14-23): where *point_col* is null and a
    polygon exists, default it to the centroid if the polygon covers it,
    else an interior point-on-surface. Rows with a point keep it."""

    @F.pandas_udf(T.StringType())
    def derive(wkt: pd.Series) -> pd.Series:
        out = []
        for w in wkt:
            ring = parse_wkt_polygon(w) if w else []
            if not ring:
                out.append(None)
                continue
            c = ring_centroid(ring)
            if c is not None and point_in_ring(c[0], c[1], ring):
                pt = c
            else:
                pt = point_on_surface(ring)
            out.append(f"POINT ({pt[0]} {pt[1]})" if pt else None)
        return pd.Series(out)

    if point_col not in locations.columns:
        locations = locations.withColumn(point_col, F.lit(None).cast("string"))
    # UDF gated to the rows that actually need derivation (trigger WHEN
    # clause): everything else passes through JVM-side untouched
    needs = F.col(point_col).isNull() & F.col(polygon_col).isNotNull()
    untouched = locations.filter(~needs)
    derived = locations.filter(needs).withColumn(point_col, derive(F.col(polygon_col)))
    return untouched.unionByName(derived)


WEB_MERCATOR_R = 6378137.0  # spherical web-mercator radius (EPSG:3857)


def mercator_to_wgs84(x: float, y: float) -> tuple[float, float]:
    """EPSG:3857 → EPSG:4326 inverse spherical mercator — the common CRS
    re-projection the reference delegates to PostGIS st_transform."""
    import math

    lng = math.degrees(x / WEB_MERCATOR_R)
    lat = math.degrees(2.0 * math.atan(math.exp(y / WEB_MERCATOR_R)) - math.pi / 2.0)
    return (lng, lat)


def wgs84_to_mercator(lng: float, lat: float) -> tuple[float, float]:
    import math

    x = math.radians(lng) * WEB_MERCATOR_R
    y = math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0)) * WEB_MERCATOR_R
    return (x, y)


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
