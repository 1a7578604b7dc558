"""Training-corpus curation operators (north-star family).

Three stages every large-scale LLM data pipeline runs between raw scrape
and tokenization, built Spark-first:

  - repetition_metrics  — Gopher-style per-document repetition / quality
    signals (duplicate-word fraction, top-word fraction, duplicate-bigram
    fraction, mean word length) + a keep flag. One explode + two
    map-side-combined aggregations at doc granularity; no Python.
  - decontaminate       — flag corpus documents sharing any k-gram word
    shingle with a benchmark/eval set (the standard n-gram overlap
    decontamination from GPT-3/Gopher/Llama reports). The benchmark
    shingle set is small by construction → broadcast semi/inner join, so
    the 100 TB corpus never shuffles.
  - stratified_sample   — deterministic hash-based per-stratum sampling
    (md5(id) mod M < rate*M). Reproducible across runs/engines (no RNG
    state), embarrassingly parallel, no shuffle at all: the predicate is
    a pushable scan filter.
  - shuffle_shards      — deterministic global shuffle into training
    shards (md5 permutation; shard-keyed shuffle, no global sort).
  - pack_sequences      — greedy next-fit token-budget packing in
    hash-bucketed parallel streams (fixed-token training batches).

All hashing is md5-derived so DuckDB oracles can mirror it bit-for-bit
(same trick as operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from id3c_spark.functions.text import word_shingles, words_array


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top_word_frac: float = 0.2,
    min_distinct_ratio: float = 0.3,
    words: DataFrame | None = None,
) -> DataFrame:
    """Per-document repetition metrics + keep flag (Gopher §A1-style).

    Output: id, n_words, distinct_ratio (distinct words / words),
    top_word_frac (most frequent word's share), dup_bigram_frac
    (1 - distinct bigrams / bigrams), mean_word_len, keep.

    Shape: one explode to word grain, one groupBy(id, word) partial-agg,
    one groupBy(id) rollup — both aggs map-side combine, so the shuffle
    carries (id, word) counts, not raw words. Bigram stats stay pure
    array expressions (no second explode).

    *words* injects a prebuilt ``dedup.words_relation`` (id, pos, w) so a
    multi-stage pipeline tokenizes ONCE: per-word stats aggregate the
    shared relation directly, and bigrams come from a lead(pos) window
    (identical multiset to the array shingles) — on an id-partitioned,
    (id, pos)-sorted cached relation neither needs a new exchange before
    its id-keyed aggregate. Docs with one word get n_bigrams = 0 via the
    left join, exactly like the empty shingle array."""
    if words is not None:
        rel = words
    else:
        warr = df.select(
            F.col(id_col).alias("id"), words_array(F.col(text_col)).alias("ws")
        )
        rel = None
    if rel is not None:
        per_word = rel.groupBy("id", "w").agg(
            F.count("*").alias("c"), F.sum(F.length("w")).alias("chars")
        )
    else:
        per_word = (
            warr.select("id", F.explode("ws").alias("w"))
            .groupBy("id", "w")
            .agg(F.count("*").alias("c"), F.sum(F.length("w")).alias("chars"))
        )
    word_stats = per_word.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
        F.sum("chars").alias("n_chars"),
    )
    if rel is not None:
        w2 = Window.partitionBy("id").orderBy("pos")
        bigrams = (
            rel.withColumn("nx", F.lead("w").over(w2))
            .filter(F.col("nx").isNotNull())
            .select("id", F.concat_ws(" ", "w", "nx").alias("bg"))
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.count_distinct("bg").alias("n_distinct_bigrams"),
            )
        )
    else:
        # word_shingles' zip_with shape, NOT an index-lambda over
        # sequence(): the latter inlines the words-split into the lambda
        # and re-splits the text once per element — O(words²) regex work
        # (see word_shingles).
        bigrams = df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), 2).alias("bg"),
        ).select(
            "id",
            F.size("bg").alias("n_bigrams"),
            F.size(F.array_distinct("bg")).alias("n_distinct_bigrams"),
        )
    out = (
        word_stats.join(bigrams, "id", "left")
        .fillna(0, ["n_bigrams", "n_distinct_bigrams"])
        .select(
            F.col("id"),
            F.col("n_words"),
            F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("distinct_ratio"),
            F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
            F.when(F.col("n_bigrams") > 0,
                   F.round(1 - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6)
                   ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
            F.round(F.col("n_chars") / F.col("n_words"), 6).alias("mean_word_len"),
        )
        .withColumn(
            "keep",
            (F.col("top_word_frac") <= max_top_word_frac)
            & (F.col("distinct_ratio") >= min_distinct_ratio),
        )
    )
    return out


def _shingle_relation(
    df: DataFrame, id_col: str, text_col: str, k: int,
    words: DataFrame | None = None,
) -> DataFrame:
    """Distinct (id, k-word-shingle) relation — codegen explode+window
    shape shared with the dedup operators (interpreted HOFs measured ~10×
    slower, see dedup._exploded_shingles). *words* injects a prebuilt
    dedup.words_relation to share the tokenize+explode pass across
    stages shingling the same text."""
    from id3c_spark.operators.dedup import _exploded_shingles

    return (
        _exploded_shingles(df, id_col, text_col, k, words=words)
        .withColumnRenamed("sh", "s")
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    corpus_words: DataFrame | None = None,
) -> DataFrame:
    """Contaminated corpus docs: share >= 1 distinct k-gram word shingle
    with the benchmark set. Returns (id, n_hits = distinct overlapping
    shingles), contaminated docs only.

    Scale shape: the benchmark side is eval sets (MBs), the corpus is the
    100 TB side — so the benchmark's distinct shingle set is broadcast and
    the corpus-side relation joins it map-side with NO corpus shuffle
    before the final per-doc count (which combines map-side)."""
    bench_sh = _shingle_relation(benchmark, id_col, text_col, k).select("s").distinct()
    corpus_sh = _shingle_relation(corpus, id_col, text_col, k, words=corpus_words)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of
    the document's distinct k-gram word shingles NOT present in the
    reference. 1.0 = entirely novel text, 0.0 = fully covered — the
    scoring dual of decontaminate (which flags any overlap). Returns
    (id, n_shingles, n_novel, novelty) for docs with >= 1 shingle.

    Scale shape mirrors decontaminate: the reference's distinct shingle
    set broadcasts, the corpus side takes one map-side anti-join mark +
    per-doc count that combines map-side — the 100 TB corpus never
    shuffles on anything but its own doc key."""
    ref_sh = _shingle_relation(reference, id_col, text_col, k).select("s").distinct()
    corpus_sh = _shingle_relation(corpus, id_col, text_col, k)
    marked = corpus_sh.join(
        F.broadcast(ref_sh.withColumn("__ref", F.lit(1))), "s", "left"
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__ref").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
    )


def fertility_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tokenizer-fertility statistics per detected language: document
    count, exact mean characters-per-token and bytes-per-token (UTF-8),
    and token share. Fertility (units consumed per token) is the
    standard probe for how well a tokenizer fits each language slice of
    a multilingual corpus; chars/token is its tokenizer-free proxy.

    Sums are exact bigints (chars, bytes, tokens are integers) in ONE
    map-side-combined aggregation keyed by the language bucket —
    divisions happen once per language on the driver-bound result, so
    the plan is a single shuffle of ~|languages| partial rows no matter
    the corpus size. Token counting is the shared TOKEN_REGEX used by
    doc_stats; zero-token docs are excluded from ratios but counted."""
    from id3c_spark.functions.text import language_id, token_count

    per_doc = df.select(
        language_id(F.col(text_col)).alias("lang"),
        F.length(F.col(text_col)).cast("bigint").alias("chars"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("bytes"),
        token_count(F.col(text_col)).cast("bigint").alias("tokens"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").alias("sum_chars"),
        F.sum("bytes").alias("sum_bytes"),
        F.sum("tokens").alias("sum_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_tokens",
        F.when(
            F.col("sum_tokens") > 0,
            F.round(F.col("sum_chars") / F.col("sum_tokens"), 6),
        ).alias("chars_per_token"),
        F.when(
            F.col("sum_tokens") > 0,
            F.round(F.col("sum_bytes") / F.col("sum_tokens"), 6),
        ).alias("bytes_per_token"),
    )


def source_mixture_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    target_weights: dict[str, float],
    epochs: float = 1.0,
) -> DataFrame:
    """Mixture audit for a training run: per source stratum, available
    tokens, the token budget the target mixture assigns it (weight ×
    total available × epochs), and the effective epochs over that source
    implied by the budget — the >1.0 rows are the strata the run will
    repeat, the classic over-sampling warning in LLM data reports.

    One exact-integer agg (token sums per source, map-side combined)
    plus arithmetic on the |sources|-row result against a broadcast
    literal weight map; nothing rescans or shuffles the corpus."""
    from id3c_spark.functions.text import token_count

    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            token_count(F.col(text_col)).cast("bigint").alias("tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("avail_tokens"),
        )
    )
    weight = F.coalesce(
        *(
            [
                F.when(F.col("source") == s, F.lit(float(w)))
                for s, w in sorted(target_weights.items())
            ]
            + [F.lit(0.0)]
        )
    )
    total = per_source.agg(F.sum("avail_tokens").alias("total_tokens"))
    return (
        per_source.crossJoin(F.broadcast(total))
        .withColumn("target_weight", weight)
        .withColumn(
            "budget_tokens",
            F.floor(F.col("target_weight") * F.col("total_tokens") * F.lit(epochs))
            .cast("bigint"),
        )
        .withColumn(
            "effective_epochs",
            F.when(
                F.col("avail_tokens") > 0,
                F.round(F.col("budget_tokens") / F.col("avail_tokens"), 6),
            ).otherwise(F.lit(None)),
        )
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "target_weight",
            "budget_tokens",
            "effective_epochs",
        )
    )


def hash_bucket(col: Column, buckets: int = 1000000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5 — identical
    arithmetic is expressible in DuckDB ('0x'||substr(md5(x),1,12))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10)
        .cast("bigint") % F.lit(buckets)
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle into training shards: order by
    md5(id) (a reproducible pseudorandom permutation — no RNG state, no
    partitioning dependence), shard = md5-bucket mod n_shards, pos =
    rank within shard.

    The export step before training: every engine/run derives the same
    (shard, pos) for a given id, so a resumed or re-run export is
    byte-stable. Scale shape: the shard assignment is a pure row
    expression; only the within-shard position needs a shuffle, keyed by
    shard — n_shards-way parallel, no global sort."""
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy("h")
    return (
        df.select(
            F.col(id_col).alias("id"),
            h.alias("h"),
            (hash_bucket(F.col(id_col)) % n_shards).cast("int").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("id", "shard", "pos")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy next-fit sequence packing: assign each document to a bin so
    every bin's token total stays ≤ budget (a document larger than the
    budget gets a bin of its own) — the batch-construction step that turns
    variable-length documents into fixed-token training batches.

    Scale shape: documents are hash-bucketed into *n_buckets* independent
    streams (deterministic md5 buckets), each stream packs sequentially in
    id order inside one applyInPandas group. Packing quality is within-
    stream next-fit (bounded waste), parallelism is n_buckets, and the
    result is reproducible regardless of cluster partitioning. Bin ids are
    globally unique: bucket * 2^32 + local bin ordinal."""
    import pandas as pd

    prepared = df.select(
        F.col(id_col).alias("id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        (hash_bucket(F.col(id_col)) % n_buckets).cast("int").alias("bucket"),
    )

    def pack(key, pdf: pd.DataFrame):
        (bucket,) = key
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins, fills, positions = [], [], []
        bin_no, fill, pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_no, fill, pos = bin_no + 1, 0, 0
            bins.append(bucket * (1 << 32) + bin_no)
            positions.append(pos)
            fill += n
            fills.append(fill)
            pos += 1
        return pd.DataFrame({
            "id": pdf["id"],
            "bin": bins,
            "pos_in_bin": positions,
            "bin_fill": fills,
        })

    return prepared.groupBy("bucket").applyInPandas(
        pack, "id long, bin long, pos_in_bin int, bin_fill long"
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 1000000,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    md5(id) mod buckets < rate(stratum) * buckets.

    Reproducible (pure function of the id — stable across runs, engines,
    partitionings; rows join-able across pipeline versions), and shuffle-
    free: the predicate evaluates at the scan, so Catalyst pushes the
    stratum filter down and the sample costs one pass. This is the
    sampling discipline a 100 TB mixer wants — rerunning with a raised
    rate strictly grows the previous sample (nested samples)."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    thresh = F.floor(rate * buckets).cast("bigint")
    return df.filter(hash_bucket(F.col(id_col), buckets) < thresh)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    target_docs: int,
    alpha: float = 0.5,
    buckets: int = 1000000,
) -> DataFrame:
    """Temperature-based (α-scaling) stratum resampling — the standard
    multilingual mixing rule (sampling probability q_s ∝ n_s^α, α < 1
    upsamples low-resource strata relative to their raw share; used by
    mBERT/XLM-R-style corpus mixers).

    Per-stratum keep-rate = min(1, target·q_s / n_s) realized with the
    same deterministic md5-bucket predicate as stratified_sample, so the
    sample is reproducible and nested under rate increases.

    Scale shape: one stratum-grain aggregation (map-side combined; the
    stratum domain — languages, sources — is small by definition), the
    α-weights normalized through an exact DECIMAL sum (order-independent,
    engine-identical), and the resulting ≤|strata|-row rate relation
    broadcast onto a single corpus pass. Unlike stratified_sample's
    literal rates the predicate is join-derived, so it filters post-scan;
    inline the collected rates as literals if scan pushdown matters more
    than plan purity."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_s"))
    w = F.round(F.pow(F.col("n_s").cast("double"), F.lit(alpha)), 8).cast(
        "decimal(18,8)"
    )
    weighted = counts.select(stratum_col, "n_s", w.alias("w"))
    z = weighted.agg(F.sum("w").cast("double").alias("z"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_docs))
        * (F.col("w").cast("double") / F.col("z"))
        / F.col("n_s"),
    )
    rates = weighted.crossJoin(F.broadcast(z)).select(stratum_col, rate.alias("rate"))
    joined = df.join(F.broadcast(rates), stratum_col)
    keep = hash_bucket(F.col(id_col), buckets) < F.floor(
        F.col("rate") * buckets
    ).cast("bigint")
    return joined.filter(keep)


def budget_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    size_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Token/char-budget mixture sampling: per stratum, take documents in a
    deterministic md5-priority order until the stratum's size budget is
    exhausted — the data-mixing step of a training recipe ("x B tokens of
    code, y B of web"), made reproducible.

    Selection = rows whose running size (inclusive, in priority order)
    stays within budget, so output is a pure function of (ids, budgets):
    stable across runs, engines, and partitionings, and raising a budget
    strictly grows the previous selection (nested samples, like
    stratified_sample).

    Scale: one shuffle on the stratum key for the running-sum window;
    strata process in parallel. A single planet-sized stratum serializes
    its own window — at that point use budget_sample_twopass below
    (priority-cutoff filter: shuffle-free, approximate at the boundary
    only).
    """
    prio = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(prio, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(None).cast("long")
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(stratum_col) == value, F.lit(b)).otherwise(budget)
    return (
        df.withColumn("__cum", F.sum(F.col(size_col)).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


#: priority resolution for budget_sample_twopass: first 15 md5 hex chars
#: as a bigint — uniform over [0, 16^15), comfortably inside int64
_PRIO_BITS = 15


def budget_sample_twopass(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    size_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Shuffle-free budget sampling for strata too large to window.

    budget_sample's running-sum window serializes each stratum through
    one task — correct, but a single planet-sized stratum becomes the
    straggler. This variant replaces the window with a per-stratum
    PRIORITY CUTOFF: md5 priorities are uniform, and document size is
    independent of a document's md5, so the rows whose priority falls in
    the lowest q = budget/total fraction of priority space carry ≈ q of
    the stratum's total size. Two passes, neither shuffling rows:

      1. one map-side-combined aggregate for per-stratum totals (tiny
         driver collect, one row per stratum);
      2. a plain filter ``md5_priority <= floor(q · 16^15)`` — embarrass-
         ingly parallel, no window, no shuffle.

    Same determinism and nesting properties as budget_sample (selection
    is a pure function of ids and budgets; a raised budget strictly grows
    the selection) but approximate AT THE TOTAL: the selected mass lands
    within O(max_size·√n) of the budget rather than exactly under it.
    Strata whose budget covers their whole size are kept in full.
    """
    totals = {
        r["s"]: r["total"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(size_col).alias("total"))
        .collect()
    }
    space = 16 ** _PRIO_BITS
    cutoff = F.lit(None).cast("long")
    for value, b in sorted(budgets.items()):
        total = totals.get(value, 0)
        q = 1.0 if total <= b else b / total
        cutoff = F.when(
            F.col(stratum_col) == value, F.lit(int(q * (space - 1)))
        ).otherwise(cutoff)
    prio = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _PRIO_BITS), 16, 10
    ).cast("bigint")
    return df.filter(prio <= cutoff)


def interleave_strata(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
) -> DataFrame:
    """Deterministic round-robin training order across strata: document i
    of stratum s lands at position i * n_strata + index(s) — every
    consecutive window of the output order mixes all strata near their
    corpus proportions instead of streaming one source at a time (the
    training-order counterpart of shuffle_shards' global permutation).

    Positions are sparse when strata differ in size (a stratum's slots
    past its size stay empty) — consumers sort by position at write time,
    a distributed sort; nothing here needs a global window. Within a
    stratum the order is the same md5 priority used everywhere else.
    """
    # global window over the DISTINCT strata relation only — stratum-count
    # rows (tens), not corpus rows, so the single partition is fine
    strata = (
        df.select(stratum_col).distinct().sort(stratum_col)
        .withColumn("__sidx", F.row_number().over(
            Window.orderBy(stratum_col)) - 1)
    )
    n = strata.count()
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.join(F.broadcast(strata), stratum_col)
        .withColumn(
            "position",
            ((F.row_number().over(w) - 1) * n + F.col("__sidx")).cast("long"),
        )
        .drop("__sidx")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Overlapping word-window chunks per document — the context-window
    preparation step for RAG indexing / training-example windowing:
    chunk k of a doc covers words [k*stride+1, k*stride+size], so
    consecutive chunks overlap by size - stride words. Returns
    (id, chunk, text_chunk, n_words); docs shorter than one window
    yield their single partial chunk 0.

    Shape: explode words once, map each word to its ≤ ceil(size/stride)
    covering chunk ids with a tiny sequence (constant bound — no
    quadratic blowup), then one grouped ordered reassembly. Shuffles
    once on (doc, chunk) — at 100 TB both the explode and the group are
    uniform in document size, with no all-pairs term anywhere.
    """
    assert 0 < stride <= size
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words_array(F.col(text_col))).alias("pos", "w"),
    )
    # chunk ids k with k*stride < pos+1 <= k*stride + size  (pos is 0-based)
    lo = F.greatest(F.lit(0), F.ceil((F.col("pos") - size + 1) / F.lit(stride)))
    hi = F.floor(F.col("pos") / F.lit(stride))
    covered = words.select(
        "id", "pos", "w",
        F.explode(F.sequence(lo.cast("int"), hi.cast("int"))).alias("chunk"),
    )
    return (
        covered.groupBy("id", "chunk")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("ws"))
        .select(
            "id",
            F.col("chunk").cast("long").alias("chunk"),
            F.array_join(F.transform("ws", lambda x: x["w"]), " ").alias("text_chunk"),
            F.size("ws").cast("long").alias("n_words"),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 10,
) -> DataFrame:
    """Corpus-level exact segment dedup with document reconstruction — the
    C4 / RefinedWeb "remove repeated spans, keep one occurrence" cleaning
    step: split every document into non-overlapping *window*-word
    segments, keep only the globally FIRST occurrence of each distinct
    segment text (first = minimum ``(id, segment index)`` across the whole
    corpus), and reassemble each document from its surviving segments in
    order. Repeated boilerplate (nav bars, license footers, mirrored
    articles) survives exactly once corpus-wide instead of once per page.

    Returns ``(id, text_dedup, n_segments, n_kept)``; a document whose
    every segment is a later duplicate still appears, with empty text.

    Scale shape: one explode to word grain, one (id, seg) reassembly agg,
    then the global first-occurrence decision — a map-side-combined
    ``min(struct(id, seg))`` per md5 segment key (the shuffle carries
    16-byte keys + two ids, never segment text) and a key-equi join back,
    which AQE's skew-join split handles when one boilerplate segment
    dominates (a window-rank formulation would hot-spot the same key with
    NO skew mitigation — AQE rewrites skewed sort-merge joins only, which
    is why the join shape is the scale-safe one). Final reassembly
    shuffles on doc id.
    """
    assert window > 0
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words_array(F.col(text_col))).alias("pos", "w"),
    )
    segs = (
        words.withColumn("seg", F.floor(F.col("pos") / window).cast("long"))
        .groupBy("id", "seg")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("ws"))
        .select(
            "id",
            "seg",
            F.array_join(F.transform("ws", lambda x: x["w"]), " ").alias("text_seg"),
        )
        .withColumn("h", F.md5("text_seg"))
    )
    firsts = segs.groupBy("h").agg(F.min(F.struct("id", "seg")).alias("first"))
    kept = segs.join(firsts, "h").filter(
        (F.col("id") == F.col("first.id")) & (F.col("seg") == F.col("first.seg"))
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg", "text_seg"))),
                lambda x: x["text_seg"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    totals = segs.groupBy("id").agg(F.count("*").alias("n_segments"))
    return totals.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        F.col("n_segments").cast("long").alias("n_segments"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


def group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group — a deterministic
    reservoir: rank rows inside each group by md5(id) (a uniform random
    permutation that any engine reproduces) and keep the first k.

    Complements stratified_sample (rate-based, shuffle-free): use this
    when each stratum must contribute a FIXED count (eval-set carving,
    per-domain spot checks) rather than a proportion. One group-keyed
    window shuffle; for a planet-sized single group the same two-pass
    cutoff trick as budget_sample_twopass applies (sample the md5-rank
    distribution, take the k-th quantile as a filter cutoff).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Weighted sample of k rows by Priority Sampling (Duffield-Lund-
    Thorup): each row gets priority q = w / u with u uniform in (0, 1],
    and the k highest-priority rows are kept — inclusion probability
    ∝ min(1, w/τ), giving unbiased weighted-subset estimates. The
    uniform variate is md5-derived, so the sample is deterministic and
    engine-replayable: u = (md5_48(id) + 1) / 2^48 and q = w/u are
    single IEEE ops on exact integer inputs.

    Scale shape: one TakeOrdered (per-partition heaps, k rows to the
    driver) — no global sort, no shuffle beyond the final k. The
    uniform samplers (stratified_sample et al.) ignore weights; use
    this when longer/higher-quality documents must be proportionally
    favored (token-weighted eval carving, importance-weighted audits).
    """
    u48 = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("bigint")
    )
    u = (u48 + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    q = F.col(weight_col).cast("double") / u
    # orderBy+limit plans as TakeOrderedAndProject (per-partition heaps),
    # never a single-partition global sort window
    return (
        df.withColumn("__q", F.round(q, 6))
        .orderBy(F.desc("__q"), F.col(id_col))
        .limit(k)
        .drop("__q")
    )
