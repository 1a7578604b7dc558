"""Unit tests for soft-dedup weighting, n-gram novelty, fertility /
mixture reports, and SRP sketches (the round-6 LLM-pipeline additions).
The catalog-level oracle equivalence is covered by test_queries.py; these
pin the operator semantics on hand-built fixtures."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from id3c_spark.operators import ann, corpus, dedup


def test_soft_dedup_null_text_rows_are_singletons(spark):
    # md5(NULL) is NULL and Window.partitionBy groups NULLs as equal —
    # ungated, two null-text docs would each get weight 1/2 while a SQL
    # equi-join oracle (NULL keys never match) says 1.0
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_copies"], r["weight"])
        for r in dedup.soft_dedup_weights(df, "text", "doc_id").collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (1, 1.0)
    assert out[3] == (2, 0.5)
    assert out[4] == (2, 0.5)


def test_soft_dedup_weights_collapses_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),
            (3, "  HELLO\tWORLD  "),
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_copies"], r["weight"])
        for r in dedup.soft_dedup_weights(df, "text", "doc_id").collect()
    }
    assert out[1] == (3, round(1 / 3, 6))
    assert out[2] == (3, round(1 / 3, 6))
    assert out[3] == (3, round(1 / 3, 6))
    assert out[4] == (1, 1.0)
    # weights over each cluster sum to ~1
    assert abs(sum(w for _, w in out.values()) - 2.0) < 1e-4


def test_ngram_novelty_bounds(spark):
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    cor = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # fully covered
            (2, "entirely different words appear here now"),  # fully novel
            (3, "the quick brown fox went home"),  # partial
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r for r in corpus.ngram_novelty(cor, ref, "doc_id", "text", k=3).collect()
    }
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert 0.0 < out[3]["novelty"] < 1.0
    assert out[3]["n_novel"] < out[3]["n_shingles"]


def test_fertility_report_exact_ratios(spark):
    df = spark.createDataFrame(
        [(1, "the and is in to of a cat"), (2, "the and is of dog runs")],
        "doc_id long, text string",
    )
    rows = corpus.fertility_report(df, "doc_id", "text").collect()
    assert len(rows) == 1  # both detect as english
    r = rows[0]
    assert r["lang"] == "en"
    assert r["n_docs"] == 2
    total_chars = len("the and is in to of a cat") + len("the and is of dog runs")
    assert r["chars_per_token"] == round(total_chars / r["sum_tokens"], 6)


def test_source_mixture_report_budget_and_epochs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four", "a"), (2, "one two", "b"), (3, "one", "b")],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r
        for r in corpus.source_mixture_report(
            df, "doc_id", "text", "source", target_weights={"a": 0.75}, epochs=2.0
        ).collect()
    }
    # total tokens = 7; budget(a) = floor(0.75 * 7 * 2) = 10 over avail 4
    assert out["a"]["avail_tokens"] == 4
    assert out["a"]["budget_tokens"] == 10
    assert out["a"]["effective_epochs"] == 2.5
    assert out["b"]["target_weight"] == 0.0
    assert out["b"]["budget_tokens"] == 0


def _py_srp_sketch(vec, bits=48, seed="srp"):
    """Independent scalar mirror of ann.srp_sketch."""
    sk = 0
    for b in range(bits):
        p = 0
        for d, v in enumerate(vec):
            h = hashlib.md5(f"{seed}:{b}:{d}".encode()).hexdigest()
            s = 1 if int(h[0], 16) % 2 == 0 else -1
            p += s * int(np.trunc(np.float64(v) * ann.SRP_SCALE))
        if p >= 0:
            sk |= 1 << b
    return sk


def test_srp_sketch_matches_scalar_mirror(spark):
    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(5)]
    df = spark.createDataFrame(vecs, "id long, v array<float>")
    got = {r["id"]: r["sketch"] for r in ann.srp_sketch(df, "id", "v", bits=16).collect()}
    for i, v in vecs:
        assert got[i] == _py_srp_sketch(np.asarray(v, dtype=np.float32), bits=16)


def test_srp_pairs_complete_vs_bruteforce(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    rows = []
    for i in range(30):
        # half the vectors are jittered copies of one base → close pairs exist
        v = base + rng.normal(scale=0.05, size=16) if i % 2 else rng.normal(size=16)
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    df = spark.createDataFrame(rows, "id long, v array<float>")
    sk = {r["id"]: r["sketch"] for r in ann.srp_sketch(df, "id", "v", bits=48).collect()}
    brute = {
        (a, b): bin(sk[a] ^ sk[b]).count("1")
        for a in sk
        for b in sk
        if a < b and bin(sk[a] ^ sk[b]).count("1") <= 11
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ann.srp_pairs(df, "id", "v", bits=48, bands=12, max_hamming=11).collect()
    }
    assert got == brute
    assert brute, "fixture must produce at least one close pair"


def test_srp_pairs_rejects_incomplete_banding(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<float>")
    with pytest.raises(ValueError):
        ann.srp_pairs(df, "id", "v", bits=48, bands=6, max_hamming=6)
    with pytest.raises(ValueError):
        ann.srp_pairs(df, "id", "v", bits=48, bands=5, max_hamming=4)


def test_lsh_multiprobe_strictly_widens_candidates(spark, sf_dir):
    """Multi-probe flips the least-confident band bits on the QUERY side
    only: its results must be a superset of the unprobed run per query,
    and recall vs exact must not decrease."""
    from id3c_spark.operators.ann import lsh_bucketed_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base, probed = (
        {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_bucketed_topk(
                emb, emb, 64, k=3, bands=4, multiprobe=mp
            ).collect()
        }
        for mp in (0, 2)
    )
    # top-k can reorder when new candidates appear, so compare coverage
    # per query: every query keeps at least as many neighbors
    from collections import Counter

    nb, np_ = Counter(q for q, _ in base), Counter(q for q, _ in probed)
    assert set(nb) <= set(np_)
    assert all(np_[q] >= n for q, n in nb.items())
    assert len(probed) >= len(base)


def test_exact_rerank_restores_order_and_recall(spark, sf_dir):
    """Reranking a shortlist with exact cosine: (a) reranking the exact
    top-k candidate set reproduces exact top-k; (b) reranking a PQ
    shortlist never loses recall vs raw ADC ranking."""
    from id3c_spark.operators import pq
    from id3c_spark.operators.ann import cosine_topk, exact_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(120)
    exact = cosine_topk(emb, emb, k=3)
    rr = exact_rerank(emb, emb, exact, k=3)
    a = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rr.collect()}
    assert a == b

    books = pq.pq_train(emb, m=8, k=16, max_iter=2)
    adc = pq.pq_topk(emb, emb, books, k=12)
    refined = exact_rerank(emb, emb, adc, k=3)
    ex = {}
    for r in cosine_topk(emb, emb, k=3).collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & s) for q, s in ex.items())
    adc3 = adc.filter("rank <= 3")
    assert recall(refined) >= recall(adc3)
