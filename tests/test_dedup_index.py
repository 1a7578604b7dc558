"""Persisted near-dup index (plans/dedup_index.py): results bit-equal to
the in-memory incremental_lsh_dedup; verify reads only candidate ids'
shingle files; add_batch grows the index file-granularly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from id3c_spark.plans.dedup_index import (
    _tables,
    add_batch,
    build_dedup_index,
    dedup_against_index,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_index_dedup_matches_incremental_lsh(spark, tmp_path):
    from id3c_spark.operators.dedup import incremental_lsh_dedup

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "dix")
    build_dedup_index(corpus, path)

    got = dedup_against_index(spark, path, batch, threshold=0.5)
    want = incremental_lsh_dedup(
        batch, corpus, "doc_id", "text", threshold=0.5
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0  # the synthetic corpus plants near-dups


def test_index_verify_prunes_to_candidate_files(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).limit(3)
    path = str(tmp_path / "dix2")
    build_dedup_index(corpus, path)
    t = _tables(spark, path)
    n_files = len(t["shingles"].files())
    assert n_files >= 4

    # a tiny batch's candidate set touches few corpus ids → few files
    out = dedup_against_index(spark, path, batch, threshold=0.5)
    out.collect()
    # reproduce the pruning decision: candidate ids from the band join
    from id3c_spark.plans.dedup_index import _batch_relations

    _, sigs, occ = _batch_relations(batch, "doc_id", "text", 3, 32, 8)
    cand_ids = [
        r.id
        for r in t["signatures"].read().alias("c")
        .join(
            sigs.alias("n"),
            (F.col("c.band") == F.col("n.band"))
            & (F.col("c.bh") == F.col("n.bh")),
        )
        .select(F.col("c.id")).distinct().collect()
    ]
    kept = t["shingles"].pruned_files_in("id", cand_ids)
    occ.unpersist()
    assert len(kept) < n_files


def test_add_batch_is_file_granular_and_extends_matches(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 == 1)
    first = docs.filter(F.col("doc_id") % 3 == 2)
    second = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "dix3")
    build_dedup_index(corpus, path)
    t = _tables(spark, path)
    before = {os.path.basename(f): os.stat(f).st_ino for f in t["shingles"].files()}

    add_batch(spark, path, first)
    after = {os.path.basename(f): os.stat(f).st_ino for f in t["shingles"].files()}
    assert all(after.get(b) == ino for b, ino in before.items())

    # the second batch now matches against corpus AND first batch
    out = dedup_against_index(spark, path, second, threshold=0.5)
    matched = {r.corpus_id for r in out.collect()}
    assert any(c % 3 == 1 for c in matched) or any(c % 3 == 2 for c in matched)


def test_cli_dedup_index_build_query_add(spark, tmp_path):
    import json as _json

    from click.testing import CliRunner

    from id3c_spark.cli import cli

    docs = _docs(spark)
    corpus_path = str(tmp_path / "corpus.parquet")
    batch_path = str(tmp_path / "batch.parquet")
    docs.filter(F.col("doc_id") % 3 != 0).write.parquet(corpus_path)
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(batch_path)
    idx = str(tmp_path / "dix_cli")
    runner = CliRunner()

    res = runner.invoke(cli, ["corpus", "dedup-index", "build", idx, corpus_path])
    assert res.exit_code == 0, res.output
    assert _json.loads(res.output)["versions"]["signatures"] == 1

    res = runner.invoke(cli, ["corpus", "dedup-index", "query", idx, batch_path])
    assert res.exit_code == 0, res.output
    rows = [_json.loads(l) for l in res.output.strip().splitlines() if l]
    assert rows and {"new_id", "corpus_id", "jaccard"} <= set(rows[0])

    res = runner.invoke(cli, ["corpus", "dedup-index", "add", idx, batch_path])
    assert res.exit_code == 0, res.output
    assert _json.loads(res.output)["versions"]["shingles"] == 2


def test_prune_cap_fallback_returns_identical_pairs(spark, tmp_path):
    """The bounded-collect fallback (dedup_index.py prune_cap): when the
    band join yields more candidate ids than prune_cap — the planted
    hot-band case where collecting them would be O(corpus) driver memory
    — the verify falls back to the FULL shingles scan. Results must be
    identical to the pruned path (the equi-join on candidate pairs is
    unchanged either way)."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "dix_cap")
    build_dedup_index(corpus, path)

    pruned = dedup_against_index(spark, path, batch, threshold=0.5)
    # prune_cap=0 forces EVERY candidate set over the cap → full-scan path
    fallback = dedup_against_index(
        spark, path, batch, threshold=0.5, prune_cap=0
    )
    got = sorted(map(tuple, fallback.collect()))
    assert got == sorted(map(tuple, pruned.collect()))
    assert len(got) > 0  # the synthetic corpus plants near-dups
