"""Unit tests for k-core peeling and the PPJoin prefix-filtered exact
Jaccard join (round-6 additions)."""

from __future__ import annotations

from itertools import combinations

from id3c_spark.operators import dedup, graph


def test_kcore_peels_fringe(spark):
    # triangle 1-2-3 plus a tail 3-4-5: the 2-core is exactly the triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    out = {r["node"]: r["degree"] for r in graph.kcore(pairs, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_removal(spark):
    # a path graph has an empty 2-core, found only via cascading rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    assert graph.kcore(pairs, k=2).count() == 0


def test_kcore_fixed_rounds_match_converged(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    a = sorted(map(tuple, graph.kcore(pairs, k=2, rounds=2).collect()))
    b = sorted(map(tuple, graph.kcore(pairs, k=2, rounds=9).collect()))
    assert a == b


def _brute_jaccard(texts: dict[int, str], k: int, t: float):
    def sh(s):
        ws = [w for w in "".join(c if c.isalpha() else " " for c in s.lower()).split() if w]
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    sets = {i: sh(x) for i, x in texts.items()}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = round(inter / union, 6)
    return out


def test_prefix_filter_complete_vs_bruteforce(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "the quick brown fox jumps over the lazy dog today",
        4: "a completely different sentence about spark engines",
        5: "a completely different sentence about spark engines",
        6: "short text",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    want = _brute_jaccard(texts, 3, 0.8)
    assert got == want
    assert want, "fixture must contain qualifying pairs"


def test_prefix_filter_matches_blocked_join(spark, sf_dir):
    """Same answer as the shared-shingle blocked join on real data (both
    are exact generators at threshold 0.8 with no stop-shingle cap)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        (r["id_a"], r["id_b"])
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    assert a == b


def test_winnowing_density_and_guarantee(spark):
    """The SWA guarantee: two docs sharing a run of >= w + k - 1 words
    share a selected fingerprint hash; density is ~2/(w+1)."""
    shared = "alpha beta gamma delta epsilon zeta eta"          # 7 words >= 4+3-1
    texts = {
        1: "one two three " + shared + " four five six seven eight",
        2: "nine ten eleven twelve " + shared + " thirteen fourteen",
        3: "totally unrelated words fill this third document nicely today",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    fp = dedup.winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2], "shared 7-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # density: selected positions well under the full shingle count
    n1 = len(texts[1].split()) - 2
    assert len(by_doc[1]) < n1


def test_winnowing_selects_window_minima(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    rows = dedup.winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    # replay the rule in plain python
    import hashlib

    words = "a b c d e f g h i j".split()
    hs = []
    for i in range(len(words) - 2):
        sh = " ".join(words[i : i + 3])
        hs.append(int(hashlib.md5(sh.encode()).hexdigest()[:12], 16))
    want = set()
    for s in range(len(hs) - 3):
        window = hs[s : s + 4]
        m = min(window)
        pos = max(i for i, h in enumerate(window) if h == m) + s
        want.add((pos, m))
    assert {(r["pos"], r["h"]) for r in rows} == want


def test_gazetteer_exact_token_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, "New York is not newyork nor york new"),
            (2, "the new york times from New-York"),
        ],
        "doc_id long, text string",
    )
    out = dedup.gazetteer_tag(df, "doc_id", "text", ["New York", "times"])
    got = {(r["id"], r["phrase"], r["pos"]) for r in out.collect()}
    # doc1: 'new york' at 0; doc2: 'new york' at 1 ('the new york...') and
    # again at 5 ('New-York' tokenizes to new, york), 'times' at 3
    assert got == {
        (1, "new york", 0),
        (2, "new york", 1),
        (2, "new york", 5),
        (2, "times", 3),
    }


def test_gazetteer_rejects_empty(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        dedup.gazetteer_tag(df, "doc_id", "text", ["  ", "!!"])


def test_gazetteer_rejects_phrases_the_tokenizer_would_rewrite(spark):
    # 'covid 19' normalizes to the 1-word phrase 'covid' and would
    # over-match every bare mention — a screening primitive must refuse,
    # not silently tag a different phrase
    import pytest as _pytest

    df = spark.createDataFrame([(1, "covid cases rising")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="covid 19"):
        dedup.gazetteer_tag(df, "doc_id", "text", ["covid 19"])
    with _pytest.raises(ValueError, match="2024"):
        dedup.gazetteer_tag(df, "doc_id", "text", ["2024"])
    # case folding alone is NOT a rewrite
    out = dedup.gazetteer_tag(df, "doc_id", "text", ["COVID Cases"]).collect()
    assert [(r["id"], r["phrase"], r["pos"]) for r in out] == [(1, "covid cases", 0)]


def test_auto_salted_join_probes_and_matches_plain(spark):
    from pyspark.sql import functions as F

    from id3c_spark.operators.skew import auto_salted_join

    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1500, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame([(0, "hot"), (7, "x")], "k long, tag string")
    # tiny target forces salting; result must equal the plain join
    salted = auto_salted_join(left, right, "k", target_rows_per_task=100)
    plain = left.join(right, "k")
    assert salted.count() == plain.count() == 1500
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # balanced input → probe says 1 salt → plan is the plain join (no __salt)
    balanced = spark.range(0, 100).select(F.col("id").alias("k"))
    j = auto_salted_join(balanced, right, "k", target_rows_per_task=100)
    assert "__salt" not in j._jdf.queryExecution().optimizedPlan().toString()
