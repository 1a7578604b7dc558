"""Property-based tests (hypothesis) for core invariants.

Driver-side pure-Python properties run hundreds of cases; Spark-backed
properties use a handful of drawn examples (each Spark action costs ~100ms)
via explicit example batching.
"""

from __future__ import annotations

import json
from datetime import date, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from id3c_spark.functions.strings import iso_week_label
from id3c_spark.geo import parse_wkt_polygon, point_in_ring

CODES = st.text(alphabet="ab", min_size=8, max_size=8)


@given(st.lists(CODES, min_size=2, max_size=12, unique=True))
@settings(max_examples=20, deadline=None)
def test_hamming_blocking_complete_property(spark, codes):
    """Slices blocking finds EXACTLY the brute-force Hamming ≤ 2 pairs,
    for arbitrary 8-char codes over a worst-case tiny alphabet."""
    from id3c_spark.operators.similarity import hamming_close_pairs

    df = spark.createDataFrame([(c,) for c in codes], "barcode string")
    got = {
        (r.l_code, r.r_code)
        for r in hamming_close_pairs(df, df, "barcode", 2).collect()
        if r.l_code < r.r_code
    }
    brute = {
        (a, b)
        for a in codes for b in codes
        if a < b and sum(x != y for x, y in zip(a, b)) <= 2
    }
    assert got == brute


@given(
    st.dictionaries(st.text(min_size=1, max_size=5), st.integers(), max_size=4),
    st.dictionaries(st.text(min_size=1, max_size=5), st.integers(), max_size=4),
)
@settings(max_examples=15, deadline=None)
def test_json_merge_matches_dict_update(spark, left, right):
    from id3c_spark.functions.json_ops import json_merge_udf

    df = spark.createDataFrame([(json.dumps(left), json.dumps(right))], "l string, r string")
    out = df.select(json_merge_udf("l", "r").alias("m")).collect()[0].m
    expected = dict(left)
    expected.update(right)
    assert json.loads(out) == expected


@given(st.integers(min_value=0, max_value=20000))
@settings(max_examples=10, deadline=None)
def test_iso_week_matches_python_isocalendar(spark, day_offset):
    d = date(1995, 1, 1) + timedelta(days=day_offset)
    got = spark.range(1).select(iso_week_label(F.lit(str(d))).alias("w")).collect()[0].w
    iso = d.isocalendar()
    assert got == f"{iso[0]}-W{iso[1]:02d}"


@given(
    st.lists(
        st.tuples(st.floats(-10, 10), st.floats(-10, 10)),
        min_size=3, max_size=8,
    ),
    st.floats(-12, 12), st.floats(-12, 12),
)
@settings(max_examples=200, deadline=None)
def test_point_in_ring_consistent_with_winding(ring_pts, px, py):
    """Ray casting never crashes and agrees with itself under ring rotation
    (driver-side pure function — cheap to hammer)."""
    ring = list(ring_pts)
    rotated = ring[1:] + ring[:1]
    assert point_in_ring(px, py, ring) == point_in_ring(px, py, rotated)


@given(
    st.lists(  # left events: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    st.lists(  # right events: (key, ts, seq)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=0, max_size=12, unique_by=lambda t: t[2],
    ),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join equals the quadratic reference: latest right (ts, seq) with
    ts <= left ts per key, for arbitrary keys/timestamps including ties."""
    from id3c_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], "key int, ts int, lid int"
    )
    rdf = spark.createDataFrame(rights, "key int, ts int, seq int")
    out = {
        r.lid: r.r_seq
        for r in asof_join(ldf, rdf, on="key", right_seq="seq", payload=["seq"]).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        matches = [(rts, seq) for (rk, rts, seq) in rights if rk == k and rts <= ts]
        expect = max(matches)[1] if matches else None
        assert out[i] == expect, (i, k, ts, matches)


@given(st.lists(st.integers(1, 500), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None)
def test_pack_sequences_budget_property(spark, sizes):
    """Next-fit packing never overfills a bin (oversized docs excepted) and
    assigns every document exactly once."""
    from id3c_spark.operators.corpus import pack_sequences

    budget = 600
    df = spark.createDataFrame(list(enumerate(sizes)), "doc_id int, n int")
    out = pack_sequences(df, "doc_id", "n", budget=budget, n_buckets=2).toPandas()
    assert sorted(out["id"]) == list(range(len(sizes)))
    fills = out.groupby("bin")["bin_fill"].max()
    singletons = out.groupby("bin").size()
    for b, fill in fills.items():
        assert fill <= budget or singletons[b] == 1


@given(
    st.integers(1, 60),                     # n words
    st.integers(1, 12),                     # stride
    st.integers(0, 8),                      # size = stride + extra
)
@settings(max_examples=10, deadline=None)
def test_chunk_documents_coverage_property(spark, n, stride, extra):
    """Every word lands in at least one chunk; words within a chunk keep
    document order; stride-aligned chunk starts reconstruct the doc."""
    from id3c_spark.operators.corpus import chunk_documents

    size = stride + extra
    words = [chr(ord("a") + i % 26) * (i // 26 + 1) for i in range(n)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = {
        r.chunk: r.text_chunk.split(" ")
        for r in chunk_documents(df, "doc_id", "text", size=size, stride=stride).collect()
    }
    # chunk k holds exactly words[k*stride : k*stride+size]
    for k, ws in chunks.items():
        assert ws == words[k * stride : k * stride + size]
    # coverage: concatenating each chunk's first `stride` words rebuilds the doc
    rebuilt = [w for k in sorted(chunks) for w in chunks[k][:stride]]
    assert rebuilt[:n] == words


def test_wkt_roundtrip():
    ring = parse_wkt_polygon("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert ring == [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    assert parse_wkt_polygon("not wkt") == []
    assert parse_wkt_polygon(None) == []


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=12, deadline=None)
def test_segment_dedup_invariants_property(spark, texts):
    """For arbitrary word-soup corpora: (1) each kept document text is the
    in-order concatenation of a subset of its segments with the first
    copy of any duplicated segment surviving, (2) the corpus-wide kept
    segment count equals the number of DISTINCT segment texts, (3) word
    mass is conserved: every distinct segment's words appear exactly
    once across all text_dedup outputs."""
    from id3c_spark.operators.corpus import segment_dedup

    w = 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = segment_dedup(df, "doc_id", "text", window=w).collect()

    # independent mirror
    segs = {}  # (doc, seg) -> text
    for doc, text in enumerate(texts):
        words = [x for x in text.split() if x]
        for s in range(0, len(words), w):
            segs[(doc, s // w)] = " ".join(words[s : s + w])
    first = {}
    for key in sorted(segs):
        first.setdefault(segs[key], key)
    expect = {}
    for doc, text in enumerate(texts):
        words = [x for x in text.split() if x]
        kept = [
            segs[(doc, i)]
            for i in range(0, (len(words) + w - 1) // w)
            if first[segs[(doc, i)]] == (doc, i)
        ]
        if words:
            expect[doc] = (" ".join(kept), (len(words) + w - 1) // w, len(kept))

    got = {r["id"]: (r["text_dedup"], r["n_segments"], r["n_kept"]) for r in out}
    assert got == expect
    assert sum(v[2] for v in got.values()) == len({s for s in segs.values()})


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=2, max_size=20,
)


@given(st.lists(WORDS, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_bigram_lm_properties(spark, docs_words):
    """CE is a mean of -log probabilities with P<=1, so it is >= 0; the
    bigram count per doc is exactly len(words)-1."""
    from id3c_spark.operators.lm import bigram_lm_score

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert set(out) == set(range(len(rows)))
    for i, ws in enumerate(docs_words):
        assert out[i].n_bigrams == len(ws) - 1
        assert out[i].cross_entropy >= 0


@given(
    st.lists(
        st.tuples(st.integers(0, 50) | st.none(),
                  st.sampled_from(["x", "y", "z"]) | st.none()),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_profile_table_invariants(spark, rows):
    """nulls + distinct accounting: n_nulls counts missing, n_distinct
    counts non-null distinct, min <= max when any value exists."""
    from id3c_spark.operators.profile import profile_table

    df = spark.createDataFrame(rows, "a long, b string")
    prof = {r.col_name: r for r in profile_table(df).collect()}
    a_vals = [r[0] for r in rows if r[0] is not None]
    b_vals = [r[1] for r in rows if r[1] is not None]
    assert prof["a"].n_rows == prof["b"].n_rows == len(rows)
    assert prof["a"].n_nulls == len(rows) - len(a_vals)
    assert prof["a"].n_distinct == len(set(a_vals))
    assert prof["b"].n_distinct == len(set(b_vals))
    if a_vals:
        assert prof["a"].min_num == float(min(a_vals))
        assert prof["a"].max_num == float(max(a_vals))
    else:
        assert prof["a"].min_num is None
    if b_vals:
        assert prof["b"].min_str == min(b_vals) and prof["b"].max_str == max(b_vals)


_EV = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # user
        st.integers(min_value=0, max_value=50),   # ts
        st.sampled_from(["a", "b", "c"]),         # step type
    ),
    min_size=0,
    max_size=40,
)


@given(_EV)
@settings(max_examples=15, deadline=None)
def test_funnel_matches_bruteforce_model(spark, events):
    """funnel_steps == 'any strictly-increasing (a,b,c) chain exists',
    with the greedy earliest chain timestamps."""
    from id3c_spark.operators.funnel import funnel_steps

    rows = [
        (f"u{u}", __import__("datetime").datetime(2026, 1, 1, 0, 0, t), s)
        for u, t, s in events
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    ) if rows else spark.createDataFrame(
        [], "user_id string, ts timestamp, event_type string"
    )
    got = {
        r["user"]: (r["ts_0"], r["ts_1"], r["ts_2"])
        for r in funnel_steps(df, ["a", "b", "c"]).collect()
    }

    # brute-force greedy model per user
    expected = {}
    by_user: dict = {}
    for u, t, s in events:
        by_user.setdefault(f"u{u}", []).append((t, s))
    for u, evs in by_user.items():
        t0 = min((t for t, s in evs if s == "a"), default=None)
        if t0 is None:
            continue
        t1 = min((t for t, s in evs if s == "b" and t > t0), default=None)
        if t1 is None:
            continue
        t2 = min((t for t, s in evs if s == "c" and t > t1), default=None)
        if t2 is None:
            continue
        expected[u] = (t0, t1, t2)
    assert set(got) == set(expected)
    for u, (t0, t1, t2) in expected.items():
        g0, g1, g2 = got[u]
        secs = lambda us: (us // 1_000_000) % 3600  # noqa: E731
        assert (secs(g0), secs(g1), secs(g2)) == (t0, t1, t2)


_LOG = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.sampled_from(["X", "Y"]),              # attr
    ),
    min_size=0,
    max_size=20,
)


@given(_LOG)
@settings(max_examples=15, deadline=None)
def test_scd2_changelog_model(spark, log):
    """scd2_from_changelog == run-length encoding per key: versions are
    maximal runs of equal attrs; intervals tile [first_ts, None)."""
    from id3c_spark.operators.scd import scd2_from_changelog

    rows = [(f"k{k}", i * 10, a, i) for i, (k, a) in enumerate(log)]
    df = spark.createDataFrame(
        rows, "k string, ts long, attr string, eid long"
    ) if rows else spark.createDataFrame([], "k string, ts long, attr string, eid long")
    got = sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in scd2_from_changelog(df, "k", ["attr"], "ts", "eid").collect()
    )

    expected = []
    by_key: dict = {}
    for k, ts, a, _ in rows:
        by_key.setdefault(k, []).append((ts, a))
    for k, evs in by_key.items():
        evs.sort()
        runs = []
        for ts, a in evs:
            if not runs or runs[-1][1] != a:
                runs.append([ts, a])
        for i, (ts, a) in enumerate(runs):
            end = runs[i + 1][0] if i + 1 < len(runs) else None
            expected.append((k, a, ts, end))
    assert got == sorted(expected)


WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=3,
    max_size=10,
)


@given(st.lists(WORDS, min_size=2, max_size=6))
@settings(max_examples=12, deadline=None)
def test_prefix_filter_equals_bruteforce_property(spark, docs):
    """The PPJoin prefix filter finds EXACTLY the brute-force Jaccard
    >= 0.8 pairs for arbitrary small-vocabulary documents — the regime
    where near-ties and shared-shingle skew stress the prefix lemma."""
    from itertools import combinations

    from id3c_spark.operators.dedup import prefix_filter_jaccard_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", k=2, threshold=0.8
        ).collect()
    }

    def sh(ws):
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    brute = set()
    for (a, wa), (b, wb) in combinations(rows, 2):
        sa, sb = sh(wa.split()), sh(wb.split())
        union = sa | sb
        # exact rational compare, mirroring the operator's integer verify
        if union and 5 * len(sa & sb) >= 4 * len(union):
            brute.add((a, b))
    assert got == brute


@given(st.lists(
    st.sampled_from("aa bb cc dd ee ff".split()), min_size=6, max_size=20))
@settings(max_examples=10, deadline=None)
def test_winnowing_matches_scalar_replay_property(spark, words):
    """The frame-window winnowing selection equals a scalar replay of
    the SWA rule (min hash per w-window, rightmost tie) on arbitrary
    small-alphabet word streams — ties are COMMON here, stressing the
    struct-min tiebreak."""
    import hashlib

    from id3c_spark.operators.dedup import winnow_fingerprints

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = winnow_fingerprints(df, "doc_id", "text", k=2, w=3).collect()
    hs = []
    for i in range(len(words) - 1):
        sh = " ".join(words[i : i + 2])
        hs.append(int(hashlib.md5(sh.encode()).hexdigest()[:12], 16))
    want = set()
    for s in range(len(hs) - 2):
        window = hs[s : s + 3]
        m = min(window)
        pos = max(j for j, h in enumerate(window) if h == m) + s
        want.add((pos, m))
    assert {(r["pos"], r["h"]) for r in rows} == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=8,
    )
)
def test_int8_quantize_roundtrip_bound_property(spark, vecs):
    """quantize_int8 invariants: codes in [-127,127], reconstruction
    error per component ≤ scale/254 (+ 1 ulp slack), zero vectors
    round-trip to exact zeros."""
    from id3c_spark.operators.ann import dequantize_int8, quantize_int8

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = quantize_int8(df).collect()
    for r in q:
        assert all(-127 <= c <= 127 for c in r.q)
        assert r.scale >= 0
    dq = {
        r.vec_id: r.embedding
        for r in dequantize_int8(quantize_int8(df)).collect()
    }
    orig = {r.vec_id: [float(x) for x in r.embedding] for r in df.collect()}
    scales = {r.vec_id: r.scale for r in q}
    for vid, vals in orig.items():
        bound = scales[vid] / 254.0 * (1.0 + 1e-9) + 1e-12
        for got, want in zip(dq[vid], vals):
            assert abs(got - want) <= bound, (vid, got, want, bound)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),
            st.lists(st.floats(-100, 100, allow_nan=False, width=32),
                     min_size=4, max_size=4),
        ),
        min_size=4, max_size=12,
    ).filter(lambda rows: {s for s, _ in rows} == {0, 1})
)
def test_embedding_drift_properties(spark, rows):
    """Invariants: identical populations → smd 0 everywhere; swapping
    sides negates smd; n_0+n_1 == corpus size per dim."""
    from id3c_spark.operators.ann import embedding_drift

    df = spark.createDataFrame(
        [(i, s, [float(x) for x in v]) for i, (s, v) in enumerate(rows)],
        "vec_id long, side int, embedding array<float>",
    )
    out = {r.dim: r for r in embedding_drift(df, F.col("side")).collect()}
    n = len(rows)
    assert all(r.n_0 + r.n_1 == n for r in out.values())
    flipped = {
        r.dim: r
        for r in embedding_drift(df, 1 - F.col("side")).collect()
    }
    for d, r in out.items():
        f = flipped[d]
        assert (r.n_0, r.n_1) == (f.n_1, f.n_0)
        assert abs(r.smd + f.smd) < 2e-6  # negation up to the 6-dp round

    # identical populations: duplicate every vector onto both sides
    dup = spark.createDataFrame(
        [(i * 2 + s2, s2, [float(x) for x in v])
         for i, (_, v) in enumerate(rows) for s2 in (0, 1)],
        "vec_id long, side int, embedding array<float>",
    )
    same = embedding_drift(dup, F.col("side")).collect()
    assert all(r.smd == 0.0 and r.mean_0 == r.mean_1 for r in same)


@given(
    st.integers(min_value=0, max_value=400),   # row count
    st.integers(min_value=1, max_value=16),    # partitions
    st.integers(min_value=1, max_value=100),   # cap
)
@settings(max_examples=12, deadline=None)
def test_bounded_collect_detection_property(spark, n, parts, cap):
    """bounded_collect invariants for arbitrary (rows, partitions, cap):
    complete exactly when n <= cap, overflow reported (len > cap)
    exactly when n > cap, transfer bounded by parts x (cap + 1)."""
    from id3c_spark.operators.bounded import bounded_collect

    df = spark.range(0, n, 1, parts)
    rows = bounded_collect(df, cap)
    if n <= cap:
        assert sorted(r.id for r in rows) == list(range(n))
    else:
        assert len(rows) > cap
    assert len(rows) <= max(parts, 1) * (cap + 1)
