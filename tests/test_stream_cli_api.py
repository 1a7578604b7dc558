"""Structured-Streaming ETL, CLI, and web-API surface tests."""

from __future__ import annotations

import json

from click.testing import CliRunner
from pyspark.sql import functions as F

from id3c_spark.api import create_app
from id3c_spark.cli import cli
from id3c_spark.etl import presence_absence
from id3c_spark.etl.warehouse import Warehouse
from id3c_spark.streaming.stream_etl import run_available_now
from tests import fixtures


def test_streaming_etl_checkpointed(spark, tmp_path):
    """availableNow streaming: each file processed exactly once across runs."""
    src = tmp_path / "receiving"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ids = spark.createDataFrame(
        fixtures.identifier_rows(), "uuid string, barcode string, identifier_set_id long"
    )
    batches = []

    def transform(receiving):
        batches.append(receiving.count())
        presence_absence.run(spark, receiving, wh, ids)

    docs = fixtures.pa_documents()
    (src / "a.ndjson").write_text(docs[0][1] + "\n")
    run_available_now(spark, str(src), ckpt, transform)
    assert batches == [1]
    pa_after_first = wh.read("presence_absence").count()
    assert pa_after_first > 0

    # second run, nothing new → no batch with rows
    run_available_now(spark, str(src), ckpt, transform)
    assert batches == [1]

    # new file → only it is processed; correction applies
    (src / "b.ndjson").write_text(docs[2][1] + "\n")
    run_available_now(spark, str(src), ckpt, transform)
    assert batches == [1, 1]
    flu = (
        wh.read("presence_absence")
        .join(wh.read("target").select("target_id", F.col("identifier").alias("t")), "target_id")
        .filter(F.col("t") == "Flu_A_pan")
        .collect()
    )
    assert any(r.present is False for r in flu)


def test_cli_upload_and_mint(tmp_path):
    runner = CliRunner()
    src = tmp_path / "up.ndjson"
    src.write_text('{"samples": []}\n{"store": "x"}\n')
    res = runner.invoke(cli, [
        "upload", str(src), "--receiving-dir", str(tmp_path / "recv"),
        "--table", "presence_absence",
    ])
    assert res.exit_code == 0, res.output
    assert json.loads(res.output)["uploaded"] == 2

    res2 = runner.invoke(cli, ["mint", "--n", "3", "--set-id", "1", "--seed", "cli"])
    assert res2.exit_code == 0, res2.output
    lines = [json.loads(l) for l in res2.output.strip().splitlines()]
    assert len(lines) == 3
    for row in lines:
        assert row["uuid"].replace("-", "").endswith(row["barcode"])


def test_api_receiving_and_lookup(spark, tmp_path):
    ids = spark.createDataFrame(
        fixtures.identifier_rows(), "uuid string, barcode string, identifier_set_id long"
    )
    idp = str(tmp_path / "identifiers.parquet")
    ids.toPandas().to_parquet(idp)

    app = create_app(str(tmp_path / "recv"), idp)
    client = app.test_client()

    ok = client.post("/v1/receiving/presence-absence", data='{"samples": []}')
    assert ok.status_code == 201
    bad = client.post("/v1/receiving/presence-absence", data='[1,2]')
    assert bad.status_code == 400          # json_typeof object constraint
    nope = client.post("/v1/receiving/unknown-endpoint", data='{}')
    assert nope.status_code == 404

    got = client.get("/v1/warehouse/identifier/11112222")
    assert got.status_code == 200
    assert got.get_json()["uuid"] == fixtures.SAMPLE_BARCODES["11112222"]
    # citext: mixed-case barcode resolves too
    assert client.get("/v1/warehouse/identifier/AabBccDD").status_code == 200
    assert client.get("/v1/warehouse/identifier/zzzzzzzz").status_code == 404

    ver = client.post(
        "/v1/verification/barcode-uses/verify",
        json=["11112222", "AABBCCDD", "nope0000"],
    )
    assert [v["known"] for v in ver.get_json()] == [True, True, False]

    # uploaded document landed in the receiving log verbatim
    log = (tmp_path / "recv" / "presence_absence.ndjson").read_text()
    assert log == '{"samples": []}\n'
