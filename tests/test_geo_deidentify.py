"""Geo lookup, de-identify, sources, multimodal tests."""

from __future__ import annotations

import gzip
import os

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


def test_fastq_read_sets(spark, tmp_path):
    d = tmp_path / "fastq"
    d.mkdir()
    for name in ["12345_R1.fastq.gz", "12345_R2.fastq.gz", "678_R1.fastq.gz", "bad.txt"]:
        with gzip.open(d / name, "wb") as f:
            f.write(b"@read\nACGT\n+\n!!!!\n")
    out = {r.sample: r.urls for r in readers.fastq_read_sets(spark, str(d)).collect()}
    assert set(out) == {"12345", "678"}
    assert len(out["12345"]) == 2 and out["12345"] == sorted(out["12345"])


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", "image/png", bytes([0, 100, 200]), (None, None, None)),
        (2, "video", "video/mp4", None, (None, None, 2500)),
        (3, "audio", "audio/wav", b"xx", (None, None, 1000)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_image_features(media).collect()
    assert len(feats) == 1
    assert feats[0].n_bytes == 3 and abs(feats[0].mean_byte - 100.0) < 1e-9
    frames = multimodal.sample_video_frames(media, every_ms=1000).collect()
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000]
