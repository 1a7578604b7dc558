"""Streaming corpus ingest: quality gate + corpus-guarded dedup + append,
and partitioned-layout pruning evidence."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from id3c_spark.sources.bucketing import scan_pruning_evidence, write_partitioned
from id3c_spark.sources.store import ParquetTable
from id3c_spark.streaming.corpus_ingest import IngestStats, run_corpus_ingest

SEED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR_SEED = "alpha beta gamma delta epsilon zeta eta theta iota mu"      # 7/9 jaccard vs SEED
FRESH = "one two three four five six seven eight nine ten"
FRESH2 = "red orange yellow green blue indigo violet cyan magenta white"
LOW_QUALITY = "spam spam spam spam spam spam spam spam spam spam"


def write_batch(path, docs):
    with open(path, "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_corpus_ingest_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    table = ParquetTable(spark, str(tmp_path / "corpus"))
    table.publish(
        spark.createDataFrame([(1, SEED)], "doc_id long, text string")
    )
    stats = IngestStats()

    # batch 1: near-dup of the seed (dropped), a fresh doc (kept), a
    # low-quality doc (dropped by the repetition gate), a re-delivered
    # duplicate line of the fresh doc (within-batch dedup)
    write_batch(
        src / "b1.ndjson",
        [(10, NEAR_SEED), (11, FRESH), (12, LOW_QUALITY), (11, FRESH)],
    )
    run_corpus_ingest(
        spark, str(src), str(tmp_path / "ckpt"), table, stats=stats
    )
    after1 = {r["doc_id"] for r in table.read().collect()}
    assert after1 == {1, 11}
    assert stats.batches[-1]["n_appended"] == 1

    # batch 2: an exact replay of doc 11 under a NEW id (content guard)
    # and a genuinely new doc; the checkpoint must not re-read b1
    write_batch(src / "b2.ndjson", [(20, FRESH), (21, FRESH2)])
    run_corpus_ingest(
        spark, str(src), str(tmp_path / "ckpt"), table, stats=stats
    )
    after2 = {r["doc_id"] for r in table.read().collect()}
    assert after2 == {1, 11, 21}

    # replay with a FRESH checkpoint: every line re-feeds, but the id
    # anti-join + near-dup guard make the whole replay a no-op
    run_corpus_ingest(
        spark, str(src), str(tmp_path / "ckpt2"), table, stats=stats
    )
    assert {r["doc_id"] for r in table.read().collect()} == after2
    assert table.read().count() == 3


def test_partitioned_scan_prunes_and_pushes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}", i * 10) for i in range(30)],
        "id long, dt string, v long",
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, ["dt"])
    scan = spark.read.parquet(path).filter(
        (F.col("dt") == "2024-01-02") & (F.col("v") > 40)
    )
    part, pushed = scan_pruning_evidence(scan)
    # the dt predicate prunes directories; the v predicate reaches parquet
    assert "dt" in part and "2024-01-02" in part
    assert "GreaterThan(v,40)" in pushed
    assert scan.count() == 10 - sum(1 for i in range(30) if (i % 3) == 1 and i * 10 <= 40)


def test_cli_corpus_ingest_and_snapshot(spark, tmp_path):
    import json as _json

    from click.testing import CliRunner

    from id3c_spark.cli import cli

    src = tmp_path / "in"
    src.mkdir()
    write_batch(src / "b1.ndjson", [(1, FRESH), (2, FRESH2), (3, LOW_QUALITY)])
    runner = CliRunner()
    table = str(tmp_path / "corpus")
    res = runner.invoke(cli, [
        "corpus", "ingest", str(src), table,
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    assert res.exit_code == 0, res.output
    stats = _json.loads(res.output.strip().splitlines()[-1])
    assert stats["batches"][-1]["n_appended"] == 2

    snap = runner.invoke(cli, ["corpus", "snapshot", table])
    assert snap.exit_code == 0, snap.output
    info = _json.loads(snap.output.strip().splitlines()[-1])
    assert info["rows"] == 2 and info["current"] in info["versions"]


def test_corpus_ingest_quarantines_malformed_lines(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    table = ParquetTable(spark, str(tmp_path / "corpus"))
    quarantine = ParquetTable(spark, str(tmp_path / "dlq"))
    (src / "b1.ndjson").write_text(
        '{"doc_id": 1, "text": "a perfectly healthy document with words"}\n'
        "this is not json at all\n"
        '{"text": "no id on this one"}\n'
        '{"doc_id": 7}\n'
    )
    run_corpus_ingest(
        spark, str(src), str(tmp_path / "ckpt"), table, quarantine=quarantine
    )
    kept = {r["doc_id"] for r in table.read().collect()}
    assert kept == {1}
    dlq = {(r["reason"], r["raw"]) for r in quarantine.read().collect()}
    assert ("unparseable", "this is not json at all") in dlq
    assert ("missing doc_id", '{"text": "no id on this one"}') in dlq
    assert ("missing text", '{"doc_id": 7}') in dlq
    # checkpointed re-run: no duplicate quarantine rows
    run_corpus_ingest(
        spark, str(src), str(tmp_path / "ckpt"), table, quarantine=quarantine
    )
    assert quarantine.read().count() == 3
