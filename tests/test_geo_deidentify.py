"""Geo lookup, de-identify, sources, multimodal tests."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from id3c_spark import deidentify, geo, multimodal
from id3c_spark.sources import readers

GOLDEN = "72a79a0f21b20b9c7d0a117addc0d917bcda3065c9c8329aea77b11cb39096c8"


def test_generate_hash_golden_vector(spark):
    # reference doctest vector (de_identify.py:95-96)
    got = spark.range(1).select(
        deidentify.generate_hash(F.lit("foo"), "abadsecret").alias("h")
    ).collect()[0].h
    assert got == GOLDEN


def test_deidentify_drops_columns(spark):
    df = spark.createDataFrame([("1 Main St", "Seattle", 3.5)], "street string, city string, x double")
    out = deidentify.deidentify(df, ["street", "city"], "s3cret")
    assert set(out.columns) == {"x", "hash"}
    assert len(out.collect()[0].hash) == 64


def test_deidentify_reference_join_semantics(spark):
    # reference joins with a single space (de_identify.py:58) and emits a
    # NULL hash when the joined value is empty (de_identify.py:60) — the
    # multi-column hash must be byte-identical to ' '.join(values)+secret
    import hashlib

    df = spark.createDataFrame(
        [(1, "1 Main St", "Seattle"), (2, None, None), (3, None, "Seattle")],
        "id long, street string, city string",
    )
    out = {r.id: r.hash for r in deidentify.deidentify(df, ["street", "city"], "s3cret").collect()}
    assert out[1] == hashlib.sha256("1 Main St Seattle".encode() + b"s3cret").hexdigest()
    # both empty → joined value is ' ' (truthy in the reference) → hashed
    assert out[2] == hashlib.sha256(" ".encode() + b"s3cret").hexdigest()
    assert out[3] == hashlib.sha256(" Seattle".encode() + b"s3cret").hexdigest()
    # single empty column → joined value '' → null hash
    single = spark.createDataFrame([(1, None)], "id long, street string")
    assert deidentify.deidentify(single, ["street"], "s3cret").collect()[0].hash is None


SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
FAR_SQUARE = "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"


def test_point_in_polygon_lookup(spark):
    locs = spark.createDataFrame(
        [("tract-b", SQUARE), ("tract-a", SQUARE), ("tract-z", FAR_SQUARE)],
        "identifier string, polygon_wkt string",
    )
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 25.0, 25.0), (3, 50.0, 50.0), (4, None, None)],
        "pid long, lng double, lat double",
    )
    out = {r.pid: r.tract_identifier for r in geo.lookup_tract(pts, locs).collect()}
    assert out[1] == "tract-a"     # tie-break: order by identifier limit 1
    assert out[2] == "tract-z"
    assert out[3] is None          # outside everything
    assert out[4] is None          # NaN row survives with null


def test_point_in_polygon_join_is_equi_not_nested_loop(spark):
    # The r7 scale shape: polygon→covering-cell relation, EQUI-join on the
    # cell id, then bbox + ray-cast refine. A bare bbox range predicate
    # compiles to BroadcastNestedLoopJoin — O(points × polygons) at a
    # national polygon set; the cell cover must keep it a hash join.
    locs = spark.createDataFrame(
        [("tract-b", SQUARE), ("tract-a", SQUARE), ("tract-z", FAR_SQUARE)],
        "identifier string, polygon_wkt string",
    )
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 25.0, 25.0), (3, 50.0, 50.0)],
        "pid long, lng double, lat double",
    )
    out = geo.lookup_tract(pts, locs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # grid-boundary completeness: polygon-interior points sitting exactly
    # ON a cell edge must still match (floor puts them in a covered cell)
    edge = spark.createDataFrame(
        [(10, 5.0, 5.0), (11, 5.0, 2.5), (12, 2.5, 5.0)],
        "pid long, lng double, lat double",
    )
    got = {r.pid: r.tract_identifier
           for r in geo.lookup_tract(edge, locs, cell_deg=5.0).collect()}
    assert got == {10: "tract-a", 11: "tract-a", 12: "tract-a"}


def test_polygon_cell_cover_complete(spark):
    # every point inside a polygon's bbox lands in a covered cell at any
    # grid resolution (floor is monotone) — sweep a few resolutions
    locs = spark.createDataFrame(
        [("t", SQUARE)], "identifier string, polygon_wkt string"
    )
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(
            [(0.01, 0.01), (9.99, 9.99), (5, 5), (0, 5), (5, 0.01), (3.3, 7.7)]
        )],
        "pid long, lng double, lat double",
    )
    for cell in (0.5, 3.0, 25.0):
        out = {r.pid: r.tract_identifier
               for r in geo.lookup_tract(pts, locs, cell_deg=cell).collect()}
        assert all(v == "t" for v in out.values()), (cell, out)


def test_oversized_polygon_cell_cap_and_slim_broadcast(spark):
    # r7-ADVICE: a polygon much larger than the p90 span (state among
    # tracts) must NOT expand to O((span/cell)^2) cover rows — it gets its
    # own coarser grid level, hard-capped at (MAX_SPAN_CELLS+1)^2 rows.
    big = "POLYGON ((0 0, 1000 0, 1000 1000, 0 1000, 0 0))"
    locs = spark.createDataFrame(
        [("tiny-a", SQUARE), ("tiny-b", FAR_SQUARE), ("state", big)],
        "identifier string, polygon_wkt string",
    )
    bboxed = geo.with_bbox(locs).select(
        F.col("identifier").alias("tract_identifier"), "polygon_wkt", "__bbox"
    )
    cover = geo.polygon_cells(bboxed, cell_deg=1.0)  # tiny cell vs 1000-span
    per_poly = {
        r.tract_identifier: r.n
        for r in cover.groupBy("tract_identifier").agg(F.count("*").alias("n")).collect()
    }
    cap = (geo.MAX_SPAN_CELLS + 1) ** 2
    assert all(n <= cap for n in per_poly.values()), per_poly
    # the broadcast side must not carry WKT (slim cover: lvl/cx/cy/id/bbox)
    # — pinned on the PRODUCTION relation lookup_tract broadcasts, not a
    # test-local reconstruction
    slim = geo._slim_cover(bboxed, 1.0)
    assert "polygon_wkt" not in slim.columns
    assert set(slim.columns) == {"__lvl", "__cx", "__cy", "tract_identifier", "__bbox"}
    out = geo.lookup_tract(
        spark.createDataFrame(
            [(1, 5.0, 5.0), (2, 500.0, 500.0), (3, 25.0, 25.0)],
            "pid long, lng double, lat double",
        ),
        locs,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got = {r.pid: r.tract_identifier for r in out.collect()}
    # point 1 is inside both SQUARE and the state polygon → identifier
    # tie-break picks 'state' < 'tiny-a'; point 2 only in the state polygon
    assert got == {1: "state", 2: "state", 3: "state"}
    # results identical when the oversized polygon is absent
    small = spark.createDataFrame(
        [("tiny-a", SQUARE)], "identifier string, polygon_wkt string"
    )
    got2 = {
        r.pid: r.tract_identifier
        for r in geo.lookup_tract(
            spark.createDataFrame([(1, 5.0, 5.0)], "pid long, lng double, lat double"),
            small,
        ).collect()
    }
    assert got2 == {1: "tiny-a"}


def test_ray_casting_boundary():
    ring = geo.parse_wkt_polygon(SQUARE)
    assert geo.point_in_ring(5, 5, ring)
    assert not geo.point_in_ring(15, 5, ring)
    assert geo.point_in_ring(0, 5, ring)      # boundary counts (st_covers)


def test_ndjson_reader(spark, tmp_path):
    p = tmp_path / "docs.ndjson"
    p.write_text('{"a": 1}\n\n{"b": 2}\n')
    df = readers.read_ndjson_receiving(spark, str(p))
    rows = df.orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].document == '{"a": 1}'     # exact text preserved


def test_utm_transform_roundtrip():
    """Forward/inverse WGS84 UTM agree to ~1e-9 degrees over the zone's
    usable extent, the central meridian maps to easting 500 km exactly,
    and a known city lands in the plausible coordinate band."""
    from id3c_spark.geo import to_wgs84_transform, utm_to_wgs84, wgs84_to_utm

    fwd, inv = wgs84_to_utm(10), utm_to_wgs84(10)
    for lat in (-0.5, 10.0, 35.0, 47.6, 60.0, 75.0):
        for dlng in (-2.9, -1.0, 0.0, 1.7, 2.9):   # zone 10 spans 126°W-120°W
            lng = -123.0 + dlng
            x, y = fwd(lng, lat)
            lng2, lat2 = inv(x, y)
            assert abs(lng2 - lng) < 1e-8 and abs(lat2 - lat) < 1e-8

    x, _ = fwd(-123.0, 45.0)                       # central meridian
    assert abs(x - 500000.0) < 1e-6

    e, n = fwd(-122.3321, 47.6062)                 # Seattle: ~550 km E, ~5273 km N
    assert 540000 < e < 560000 and 5260000 < n < 5290000

    # southern hemisphere: false northing keeps coordinates positive
    es, ns = wgs84_to_utm(56, northern=False)(153.0, -27.5)   # Brisbane, 56S
    lngs, lats = utm_to_wgs84(56, northern=False)(es, ns)
    assert ns > 0 and abs(lngs - 153.0) < 1e-8 and abs(lats - -27.5) < 1e-8

    # EPSG dispatch: 32610 = 10N, 32756 = 56S, unknown raises
    assert to_wgs84_transform(32610)(e, n)[1] == pytest.approx(47.6062, abs=1e-6)
    assert to_wgs84_transform(32756)(es, ns)[0] == pytest.approx(153.0, abs=1e-6)
    with pytest.raises(ValueError):
        to_wgs84_transform(2926)


def test_ndjson_reader_multifile_order(spark, tmp_path):
    """Ids are sequential 1..N in (file path, line) order across files, with
    no global single-partition window (split-local row_number + broadcast
    offsets)."""
    import json

    (tmp_path / "a.ndjson").write_text(
        "".join(json.dumps({"f": "a", "n": i}) + "\n" for i in range(40))
    )
    (tmp_path / "b.ndjson").write_text(
        "".join(json.dumps({"f": "b", "n": i}) + "\n" for i in range(25))
    )
    df = readers.read_ndjson_receiving(spark, str(tmp_path))
    rows = df.orderBy("id").collect()
    assert [r.id for r in rows] == list(range(1, 66))
    docs = [json.loads(r.document) for r in rows]
    assert docs[:40] == [{"f": "a", "n": i} for i in range(40)]
    assert docs[40:] == [{"f": "b", "n": i} for i in range(25)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "windowspecdefinition(__file" in plan


def test_csv_all_strings_null_normalization(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("barcode,notes\n ABC , na \nxyz,\n")
    df = readers.read_csv_all_strings(spark, str(p))
    rows = df.collect()
    assert rows[0].barcode == "ABC" and rows[0].notes is None
    assert rows[1].barcode == "xyz" and rows[1].notes is None


def _write_minimal_xlsx(path):
    """Hand-built workbook: shared strings, inline string, number cell,
    a skipped cell (sparse B3), and an 'NA' that must normalize to null."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {ns} xmlns:r="{rns}">'
            '<sheets><sheet name="Manifest" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Target="worksheets/sheet1.xml" '
            f'Type="{rns}/worksheet"/></Relationships>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {ns}><si><t>Sample Barcode</t></si>'
            "<si><t>Notes</t></si><si><t> ABC123 </t></si><si><t>NA</t></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
            '<c r="C1" t="inlineStr"><is><t>Qty</t></is></c></row>'
            '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c>'
            '<c r="C2"><v>42</v></c></row>'
            '<row r="3"><c r="A3" t="inlineStr"><is><t>xyz</t></is></c>'
            '<c r="C3"><v>7.5</v></c></row>'
            "</sheetData></worksheet>",
        )


def test_read_excel_all_strings(spark, tmp_path):
    p = tmp_path / "manifest.xlsx"
    _write_minimal_xlsx(p)
    df = readers.read_excel_all_strings(spark, str(p), sheet="Manifest")
    assert df.columns == ["Sample Barcode", "Notes", "Qty"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = df.collect()
    assert rows[0]["Sample Barcode"] == "ABC123"  # trimmed
    assert rows[0].Notes is None  # 'NA' → null
    assert rows[0].Qty == "42"
    assert rows[1]["Sample Barcode"] == "xyz" and rows[1].Notes is None
    assert rows[1].Qty == "7.5"
    import pytest as _pytest

    with _pytest.raises(KeyError):
        readers.read_excel_all_strings(spark, str(p), sheet="nope")


U_SHAPE = "POLYGON ((0 0, 10 0, 10 10, 7 10, 7 3, 3 3, 3 10, 0 10, 0 0))"


def test_default_point_from_polygon(spark):
    """Trigger parity (point-default-from-polygon.sql:14-23): centroid when
    covered, else point-on-surface; existing points untouched."""
    locs = spark.createDataFrame(
        [("sq", SQUARE, None),
         ("u", U_SHAPE, None),                      # centroid in the notch
         ("kept", SQUARE, "POINT (1 1)"),           # point present → untouched
         ("nopoly", None, None)],
        "identifier string, polygon_wkt string, point_wkt string",
    )
    out = {r.identifier: r.point_wkt for r in geo.default_point_from_polygon(locs).collect()}
    assert out["sq"] == "POINT (5.0 5.0)"           # centroid, covered
    assert out["kept"] == "POINT (1 1)"
    assert out["nopoly"] is None
    # U-shape: centroid (5, ~5.7) sits in the notch → interior fallback
    ring = geo.parse_wkt_polygon(U_SHAPE)
    cx, cy = geo.ring_centroid(ring)
    assert not geo.point_in_ring(cx, cy, ring)
    ux, uy = (float(v) for v in out["u"][len("POINT ("):-1].split())
    assert geo.point_in_ring(ux, uy, ring)


def test_mercator_transform_roundtrip():
    lng, lat = geo.mercator_to_wgs84(0.0, 0.0)
    assert (lng, lat) == (0.0, 0.0)
    for p in [(-122.33, 47.61), (2.35, 48.86), (151.21, -33.87)]:
        x, y = geo.wgs84_to_mercator(*p)
        back = geo.mercator_to_wgs84(x, y)
        assert abs(back[0] - p[0]) < 1e-9 and abs(back[1] - p[1]) < 1e-9


def test_stage_features_reprojects_3857(spark):
    from id3c_spark.etl.location_import import stage_features

    x, y = geo.wgs84_to_mercator(-122.0, 47.0)
    fc = {
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:EPSG::3857"}},
        "features": [{
            "id": "pt1", "properties": {"scale": "city"},
            "geometry": {"type": "Point", "coordinates": [x, y]},
        }],
    }
    wkt = stage_features(spark, fc).collect()[0].polygon_wkt
    px, py = (float(v) for v in wkt[len("POINT ("):-1].split())
    assert abs(px - -122.0) < 1e-9 and abs(py - 47.0) < 1e-9


def test_read_excel_from_http_url(spark, tmp_path):
    """Remote workbook fetch parity (io/__init__.py:9-54): an http(s)
    manifest URL downloads to a temp file and parses identically."""
    import functools
    import http.server
    import threading

    _write_minimal_xlsx(tmp_path / "m.xlsx")
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/m.xlsx"
        df = readers.read_excel_all_strings(spark, url, sheet="Manifest")
        assert df.columns == ["Sample Barcode", "Notes", "Qty"]
        assert df.collect()[0]["Sample Barcode"] == "ABC123"
    finally:
        srv.shutdown()


def test_google_sheets_url_rewrite(spark, tmp_path):
    """A docs.google.com link resolves to the xlsx export endpoint
    (google.py:37-92) and reads through the injected transport — offline."""
    from id3c_spark.sources import remote

    assert (
        remote.extract_document_id_from_google_url(
            "https://docs.google.com/spreadsheets/d/1BxiMVs0XRA5nFMdK/edit#gid=0"
        )
        == "1BxiMVs0XRA5nFMdK"
    )
    assert remote.extract_document_id_from_google_url("s3://bucket/f.xlsx") is None

    p = tmp_path / "m.xlsx"
    _write_minimal_xlsx(p)
    seen = {}

    def opener(url):
        seen["url"] = url
        return open(p, "rb")

    df = readers.read_excel_all_strings(
        spark,
        "https://docs.google.com/spreadsheets/d/DOC-123_abc/edit#gid=0",
        sheet="Manifest",
        opener=opener,
    )
    assert seen["url"] == "https://docs.google.com/spreadsheets/d/DOC-123_abc/export?format=xlsx"
    assert df.collect()[0].Qty == "42"


def test_google_drive_authenticated_export(spark, tmp_path):
    """A 'private' workbook fetches through the credentialed Drive hook:
    the stub transport rejects requests without the Bearer token (like the
    real API does for non-link-shared docs) and serves xlsx bytes when the
    injected token is presented — reference io/google.py:37-92 parity,
    fully offline."""
    import io
    import urllib.error

    from id3c_spark.sources import google_drive, remote

    p = tmp_path / "m.xlsx"
    _write_minimal_xlsx(p)
    seen = {}

    def transport(req):
        seen["url"] = req.full_url
        if req.headers.get("Authorization") != "Bearer tok-123":
            raise urllib.error.HTTPError(req.full_url, 403, "forbidden", {}, None)
        return io.BytesIO(p.read_bytes())

    # no credentials → clear error naming the hook
    with pytest.raises(RuntimeError, match="GOOGLE_OAUTH_ACCESS_TOKEN"):
        google_drive.export_file_from_google_drive(
            "DOC-123", google_drive.GoogleDriveExportFormat.EXCEL
        )

    # wrong token → the API's 403 propagates
    with pytest.raises(urllib.error.HTTPError):
        google_drive.export_file_from_google_drive(
            "DOC-123",
            google_drive.GoogleDriveExportFormat.EXCEL,
            token="bad",
            transport=transport,
        )

    # fetch_local end-to-end with the injected credentialed transport
    with remote.fetch_local(
        "https://docs.google.com/spreadsheets/d/DOC-123/edit#gid=0",
        google_token="tok-123",
        google_transport=transport,
    ) as local:
        df = readers.read_excel_all_strings(spark, local, sheet="Manifest")
        assert df.collect()[0].Qty == "42"
    assert seen["url"].startswith(
        "https://www.googleapis.com/drive/v3/files/DOC-123/export?mimeType="
    )

    # etag freshness check through the same transport contract
    def meta_transport(req):
        assert req.headers.get("Authorization") == "Bearer tok-123"
        return io.BytesIO(
            b'{"modifiedTime": "2026-08-13T00:00:00Z", "md5Checksum": "abc"}'
        )

    etag = google_drive.get_document_etag(
        "DOC-123", token="tok-123", transport=meta_transport
    )
    assert etag == "2026-08-13T00:00:00Z/abc"


def test_fetch_local_falls_back_to_public_export_on_stale_env_token(
    tmp_path, monkeypatch
):
    """A stale GOOGLE_OAUTH_ACCESS_TOKEN (ambient, not explicitly passed)
    must not break a link-shared workbook: the 401/403 from the Drive API
    falls back to the anonymous Sheets export endpoint."""
    import io
    import urllib.error

    from id3c_spark.sources import remote

    monkeypatch.setenv("GOOGLE_OAUTH_ACCESS_TOKEN", "stale-tok")
    fetched = {}

    def public_opener(url):
        fetched["url"] = url
        return io.BytesIO(b"public-bytes")

    real_urlopen = remote.urllib.request.urlopen

    def deny(req, *a, **kw):
        raise urllib.error.HTTPError(req.full_url, 401, "expired", {}, None)

    monkeypatch.setattr(remote.urllib.request, "urlopen", deny)
    try:
        with remote.fetch_local(
            "https://docs.google.com/spreadsheets/d/DOC-9/edit",
            opener=public_opener,
        ) as local:
            assert open(local, "rb").read() == b"public-bytes"
    finally:
        monkeypatch.setattr(remote.urllib.request, "urlopen", real_urlopen)
    assert fetched["url"].endswith("/d/DOC-9/export?format=xlsx")

    # explicit credentials do NOT fall back — the denial propagates
    def transport_denies(req):
        raise urllib.error.HTTPError(req.full_url, 403, "forbidden", {}, None)

    with pytest.raises(urllib.error.HTTPError):
        with remote.fetch_local(
            "https://docs.google.com/spreadsheets/d/DOC-9/edit",
            opener=public_opener,
            google_token="explicit",
            google_transport=transport_denies,
        ):
            pass


def test_stage_features_versioned_epsg_urn(spark):
    """Versioned URN CRS forms carry an authority version before the code
    ('urn:ogc:def:crs:EPSG:8.5:4326') — the code is the last field."""
    from id3c_spark.etl.location_import import stage_features

    fc = {
        "type": "FeatureCollection",
        "crs": {"properties": {"name": "urn:ogc:def:crs:EPSG:8.5:4326"}},
        "features": [{
            "id": "pt1", "properties": {"scale": "city"},
            "geometry": {"type": "Point", "coordinates": [-122.0, 47.0]},
        }],
    }
    wkt = stage_features(spark, fc).collect()[0].polygon_wkt
    assert wkt == "POINT (-122.0 47.0)"


def _write_manifest_xlsx(path):
    """Workbook with glob-able headers, duplicates and blanks for QC."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def inline(v):
        return f'<is><t>{v}</t></is>'

    header = ["Sample ID", "Collection ID", "Collection date", "Aliquot A", "Aliquot B", "Notes"]
    rows = [
        ["AAAA1111", "CCCC1111", "3/1/2020", "a1", "a2", "keep"],
        ["AAAA2222", "", "3/2/2020", "b1", "", "keep"],
        ["", "", "", "", "", "no barcodes"],        # dropped: no barcode
        ["AAAA3333", "CCCC3333", "3/3/2020", "", "", "drop me"],
        ["AAAA3333", "CCCC4444", "3/4/2020", "", "", "dup sample"],  # dup → both dropped
    ]
    body = ""
    for r, cells in enumerate([header] + rows, start=1):
        tds = "".join(
            f'<c r="{chr(65 + i)}{r}" t="inlineStr">{inline(v)}</c>'
            for i, v in enumerate(cells) if v != ""
        )
        body += f'<row r="{r}">{tds}</row>'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>')
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook {ns} xmlns:r="{rns}">'
                   '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   f'<Relationship Id="rId1" Target="worksheets/sheet1.xml" Type="{rns}/worksheet"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<?xml version="1.0"?><worksheet {ns}><sheetData>{body}</sheetData></worksheet>')


def test_manifest_parse_pipeline(tmp_path):
    """manifest.py:278-395 parity: glob columns, multiple-source aliquots,
    row filter, QC drops, provenance rows."""
    from id3c_spark.sources import manifest_parse as mp

    wb = tmp_path / "manifest.xlsx"
    _write_manifest_xlsx(wb)
    records = mp.parse_workbook(
        str(wb), sheet="Sheet1",
        sample_column="sample id",                   # case-insensitive glob
        collection_column="Collection ID",
        date_column="collection date",
        extra_columns=[("aliquots", {"name": "aliquot *", "multiple": True}),
                       ("notes", "Notes")],
        sample_type="utm",
        row_filter="Notes != 'drop me'",            # raw source columns (py:341-343)
    )
    # row 3 (no barcodes) dropped; 'drop me' filtered; AAAA3333 dup rows:
    # one filtered by row_filter first, so the survivor keeps its barcode
    by_sample = {r["sample"]: r for r in records}
    assert set(by_sample) == {"AAAA1111", "AAAA2222", "AAAA3333"}
    r1 = by_sample["AAAA1111"]
    assert r1["collection"] == "CCCC1111"
    assert r1["date"] == "3/1/2020"
    assert r1["aliquots"] == ["a1", "a2"]
    assert r1["sample_type"] == "utm"
    prov = r1[mp.PROVENANCE_KEY]
    assert prov["row"] == 2 and prov["sheet"] == "Sheet1"
    assert len(prov["sha1sum"]) == 40
    assert by_sample["AAAA2222"]["collection"] is None
    assert by_sample["AAAA2222"]["aliquots"] == ["b1", None]

    # without the row filter, the duplicated sample barcode drops BOTH rows
    records2 = mp.parse_workbook(
        str(wb), sheet="Sheet1", sample_column="Sample ID",
        collection_column="Collection ID",
    )
    assert {r["sample"] for r in records2} == {"AAAA1111", "AAAA2222"}

    # diff: content-identical records (provenance ignored) cancel out
    changed = [dict(r, notes="edited", _provenance={"row": 99}) if r["sample"] == "AAAA1111"
               else dict(r, _provenance={"row": 99}) for r in records]
    new = mp.diff_manifests(changed, records)
    assert [r["sample"] for r in new] == ["AAAA1111"]
    # reserved destination names are rejected
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="reserved"):
        mp.parse_workbook(str(wb), sample_column="Sample ID",
                          extra_columns=[("_provenance", "Notes")])
    with _pytest.raises(ValueError, match="sample_column"):
        mp.parse_workbook(str(wb))


def test_fastq_read_sets(spark, tmp_path):
    d = tmp_path / "fastq"
    d.mkdir()
    for name in ["12345_R1.fastq.gz", "12345_R2.fastq.gz", "678_R1.fastq.gz", "bad.txt"]:
        with gzip.open(d / name, "wb") as f:
            f.write(b"@read\nACGT\n+\n!!!!\n")
    out = {r.sample: r.urls for r in readers.fastq_read_sets(spark, str(d)).collect()}
    assert set(out) == {"12345", "678"}
    assert len(out["12345"]) == 2 and out["12345"] == sorted(out["12345"])


def _make_png(width, height, pixel_rows, color_type=2, palette=None, filters=None):
    """Hand-built PNG encoder for fixtures: 8-bit, per-row filter bytes."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b""
    for i, row in enumerate(pixel_rows):
        f = filters[i] if filters else 0
        raw += bytes([f]) + bytes(row)
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_real():
    # 2×2 RGB, no filtering: mean over all channel bytes
    px = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 10, 20, 30]]
    png = _make_png(2, 2, px)
    got = multimodal.decode_png(png)
    assert (got["width"], got["height"]) == (2, 2)
    assert abs(got["mean"] - (sum(sum(r) for r in px) / 12)) < 1e-9

    # Sub + Up filters round-trip: encode deltas, decoder must reconstruct
    row0 = [10, 20, 30, 40, 50, 60]          # 2 RGB pixels
    sub_deltas = [10, 20, 30, (40 - 10) & 0xFF, (50 - 20) & 0xFF, (60 - 30) & 0xFF]
    up_deltas = [5, 0, 0, 0, 0, 0]           # row1 = row0 + deltas
    png2 = _make_png(2, 2, [sub_deltas, up_deltas], filters=[1, 2])
    expect = sum(row0) + sum((a + b) & 0xFF for a, b in zip(row0, up_deltas))
    assert abs(multimodal.decode_png(png2)["mean"] - expect / 12) < 1e-9

    # palette image: indexes dereference through PLTE for the mean
    pal_png = _make_png(2, 1, [[0, 1]], color_type=3,
                        palette=[255, 0, 0, 0, 0, 255])
    got3 = multimodal.decode_png(pal_png)
    assert got3["mean"] == (255 + 0 + 0 + 0 + 0 + 255) / 6


def test_png_resize_real(spark):
    # 4×4 RGB gradient → bounded to 2×2: decode of the re-encoded output
    # must give the nearest-neighbor-sampled pixels
    px_rows = [
        bytes(v for x in range(4) for v in (x * 10 + y * 40, 0, 255 - x * 10))
        for y in range(4)
    ]
    png = _make_png(4, 4, [list(r) for r in px_rows])
    small = multimodal.resize_png(png, 2, 2)
    got = multimodal.decode_png(small)
    assert (got["width"], got["height"]) == (2, 2)
    w, h, ch, pixels = multimodal._png_pixels(small)
    # nearest-neighbor with scale 0.5 samples source pixels (0,0),(2,0),(0,2),(2,2)
    src = multimodal._png_pixels(png)[3]
    expect = bytearray()
    for sy in (0, 2):
        for sx in (0, 2):
            off = (sy * 4 + sx) * 3
            expect.extend(src[off:off + 3])
    assert pixels == expect
    # within-bounds images pass through byte-identical
    assert multimodal.resize_png(png, 8, 8) == png

    # Spark stage: PNG rows shrink, non-PNG image rows and non-image rows survive
    media = spark.createDataFrame(
        [(1, "image", "image/png", png, (None, None, None)),
         (2, "image", "image/jpeg", b"\xff\xd8\xff", (None, None, None)),
         (3, "audio", "audio/wav", b"xx", (None, None, 1000))],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.resize_images(media, 2, 2).collect()}
    assert multimodal.decode_png(bytes(out[1].content))["width"] == 2
    assert bytes(out[2].content) == b"\xff\xd8\xff"
    assert out[3].kind == "audio"


def test_multimodal_plumbing(spark):
    png = _make_png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 10, 20, 30]])
    rows = [
        (1, "image", "image/png", png, (None, None, None)),
        (2, "video", "video/mp4", None, (None, None, 2500)),
        (3, "audio", "audio/wav", b"xx", (None, None, 1000)),
        (4, "image", "image/jpeg", bytes([0, 100, 200]), (None, None, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    assert set(feats) == {1, 4}
    # PNG: real decode → dimensions + pixel mean
    assert (feats[1].width, feats[1].height) == (2, 2)
    assert abs(feats[1].mean_byte - (sum([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]) / 12)) < 1e-9
    # non-PNG: stub byte stats, dimensions unknown
    assert feats[4].width is None and feats[4].n_bytes == 3
    assert abs(feats[4].mean_byte - 100.0) < 1e-9
    frames = multimodal.sample_video_frames(media, every_ms=1000).collect()
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000]


def test_lookup_tract_deterministic_without_row_ids(spark):
    # r8-ADVICE: the old monotonically_increasing_id row key could diverge
    # between the two join branches under recomputation. The point row
    # itself is now the key (null-safe): duplicate point rows share one
    # match, null payload columns survive the join-back, and a
    # no-coordinate point keeps a null tract.
    locs = spark.createDataFrame(
        [("t", SQUARE)], "identifier string, polygon_wkt string"
    )
    pts = spark.createDataFrame(
        [
            (1, "a", 5.0, 5.0),
            (1, "a", 5.0, 5.0),          # exact duplicate row
            (2, None, 5.0, 5.0),         # null payload column
            (3, "c", None, None),        # no coordinates
            (4, "d", 500.0, 500.0),      # outside every polygon
        ],
        "pid long, tag string, lng double, lat double",
    )
    rows = geo.lookup_tract(pts, locs).collect()
    assert len(rows) == 5  # row multiplicity preserved
    got = {(r.pid, r.tag): r.tract_identifier for r in rows}
    assert got[(1, "a")] == "t"
    assert sum(1 for r in rows if (r.pid, r.tag) == (1, "a")) == 2
    assert got[(2, None)] == "t"       # null-safe join keeps the match
    assert got[(3, "c")] is None
    assert got[(4, "d")] is None


def test_lookup_tract_supports_map_columns_and_wide_rows(spark):
    # r10-VERDICT #3: the row key is a VALUE-DERIVED digest (md5 over the
    # JSON-serialized row), so map-typed point columns — which Spark can
    # neither window over nor hash with xxhash64 — ride through, and the
    # window/join-back shuffles one 32-char key instead of the full row.
    locs = spark.createDataFrame(
        [("t", SQUARE)], "identifier string, polygon_wkt string"
    )
    pts = spark.createDataFrame(
        [
            (1, {"state": "wa", "city": "seattle"}, 5.0, 5.0),
            (1, {"state": "wa", "city": "seattle"}, 5.0, 5.0),  # duplicate
            (2, {"state": "or"}, 5.0, 5.0),
            (3, None, 500.0, 500.0),
        ],
        "pid long, hierarchy map<string,string>, lng double, lat double",
    )
    rows = geo.lookup_tract(pts, locs).collect()
    assert len(rows) == 4  # row multiplicity preserved
    assert sorted(
        (r.pid, r.tract_identifier) for r in rows
    ) == [(1, "t"), (1, "t"), (2, "t"), (3, None)]
    # the map column survives untouched
    assert {r.pid: r.hierarchy and dict(r.hierarchy) for r in rows}[2] == {
        "state": "or"
    }
