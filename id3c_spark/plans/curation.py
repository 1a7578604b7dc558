"""End-to-end training-corpus curation pipeline — the composition proof
for the north-star operator family: every stage is one of the catalog
operators, chained as a single declarative DataFrame flow.

    raw docs
      → quality gate        (corpus.repetition_metrics keep flag)
      → decontamination     (corpus.decontaminate anti-join)
      → exact dedup         (dedup.exact_dedup keep-lowest-id)
      → near-dup dedup      (dedup.minhash_lsh_pairs → dedup_clusters,
                             keep each cluster's canonical doc)
      → stratified sample   (corpus.stratified_sample)
      → shard + pack        (corpus.shuffle_shards / corpus.pack_sequences
                             on token counts)

Everything stays lazy until the caller acts; the only driver-side
materialization anywhere in the flow is dedup_clusters' bounded
convergence loop. Each stage's semantics are oracle-verified
individually by the catalog (see plans/queries.py); this module is about
their composition, tested in test_corpus_asof_multimodal.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from id3c_spark.functions.text import token_count
from id3c_spark.operators import corpus, dedup


class CurationStages(Mapping):
    """Stage map whose tail entries build on first access: curate()
    returns every stage, but constructing a plan nobody reads is not
    free — the pack/shard tail alone costs ~0.15 s of driver-side
    DataFrame construction (a pandas-UDF registration plus py4j
    chatter) — so callers that act on one stage (the oracle-verified
    composition query reads only ``sampled``) should not pay for the
    others.

    A ``Mapping`` (not a dict subclass) so EVERY standard mapping
    operation — ``in``, iteration, ``len``, ``.get()``, ``.items()``,
    ``dict(stages)`` — sees the lazy tail entries too (``items()`` /
    ``values()`` / ``dict()`` force them, the honest cost of
    enumerating; ``in`` / ``iter`` / ``len`` stay free).

    Also the stage lifecycle handle: the flow persists three relations
    (shared words, quality, exact) that would otherwise stay cached for
    the session's lifetime. ``close()`` — or leaving a ``with`` block —
    frees them (idempotent); the stage DataFrames remain valid
    afterwards, they just recompute instead of reading cache."""

    def __init__(self, eager: dict, thunks: dict, cached: list[DataFrame]):
        self._built = dict(eager)
        self._thunks = dict(thunks)
        self._cached = list(cached)

    def __getitem__(self, key):
        if key not in self._built:
            if key not in self._thunks:
                raise KeyError(key)
            self._built[key] = self._thunks.pop(key)()
        return self._built[key]

    def __iter__(self):
        yield from self._built
        yield from self._thunks

    def __len__(self):
        return len(self._built) + len(self._thunks)

    def close(self) -> None:
        """Unpersist the flow's cached relations (idempotent)."""
        cached, self._cached = self._cached, []
        for df in cached:
            df.unpersist()

    def __enter__(self) -> "CurationStages":
        return self

    def __exit__(self, *exc) -> bool:
        self.close()
        return False


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
    sample_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    jaccard_threshold: float = 0.8,
    token_budget: int = 2048,
    n_shards: int = 8,
    pair_fn=None,
) -> CurationStages:
    """Run the full curation flow; returns each stage's output keyed by
    stage name (callers act on ``packed``/``shards``, or inspect
    intermediate stages for audit counts). The returned handle owns the
    flow's persisted relations — long-lived sessions should ``close()``
    it (or use it as a context manager) once done consuming stages."""
    # ONE tokenize+explode pass feeds EVERY word-grain stage — the Gopher
    # metrics aggregates, decontamination's k=5 shingles, and the
    # near-dup k=3 shingles all read this relation: build it over the raw
    # input once, co-partition + sort so every downstream lead() window
    # and id-keyed aggregate reads the cached layout with no new
    # Exchange/Sort. Stage-specific doc subsets come from semi-joins
    # (the big side's partitioning/order survives; only the small id set
    # shuffles), or — for decontamination — from not filtering at all:
    # shingling a few non-quality docs too is cheaper than re-tokenizing,
    # and contaminated ids outside `quality` are nullified by the
    # anti-join against quality anyway.
    words_all = (
        dedup.words_relation(docs, id_col, text_col)
        .repartition("id")
        .sortWithinPartitions("id", "pos")
        .persist()
    )
    metrics = corpus.repetition_metrics(
        docs, id_col, text_col, words=words_all
    )
    # persist: quality is re-read by the decontamination probe and both
    # sides of the exact-dedup split — Spark does not dedupe common
    # subplans across one action, so without the cache the metrics
    # aggregation would run 3-4×.
    quality = docs.join(
        metrics.filter("keep").select(F.col("id").alias(id_col)), id_col, "left_semi"
    ).persist()

    contaminated = corpus.decontaminate(
        docs, benchmark, id_col, text_col, corpus_words=words_all
    ).select(F.col("id").alias(id_col))
    clean = quality.join(contaminated, id_col, "left_anti")

    exact_keep = dedup.exact_dedup(clean, text_col, id_col).select(id_col)
    # persist: the widest fan-out point — the near-dup pair generator
    # (materialized by dedup_clusters' regime probe),
    # the `unique` anti-join, and every returned stage all re-derive the
    # full quality→decontaminate→exact lineage otherwise (Spark does not
    # dedupe common subplans across actions).
    # Semi-join the CACHED quality relation, not `clean`: exact_keep is
    # already a subset of clean's ids (the exact-dedup winners), so the
    # row set is identical — but joining `clean` would embed the
    # decontamination probe a SECOND time in one action (clean appears
    # both inside exact_keep's lineage and as the join's left side, and
    # Spark does not dedupe common subplans within an action either).
    # Why this stays a second persist rather than riding quality's
    # (r12 verdict #8, adjudicated r13): the alternatives re-run the
    # decontaminate words-grain join per post-probe action (no persist)
    # or re-shuffle the full wide corpus per consumer to semi-join a
    # narrow cached id set (persist ids only — exact_keep is ~N ids at
    # scale, too big to broadcast). At 100 TB, caching the wide
    # survivors once is strictly cheaper than either recompute; the
    # relation is owned and released by CurationStages.close().
    exact = quality.join(exact_keep, id_col, "left_semi").persist()
    words_exact = words_all.join(
        exact.select(F.col(id_col).alias("id")), "id", "left_semi"
    )

    # pair_fn injects the near-dup candidate strategy (minhash banding by
    # default; exact n-gram jaccard where full-recall verification is
    # wanted — the oracle-backed composition query uses that). It receives
    # (exact_docs, their words relation) so shingle-based strategies reuse
    # the shared tokenization.
    pairs = (
        pair_fn(exact, words_exact) if pair_fn is not None
        else dedup.minhash_lsh_pairs(
            exact, id_col, text_col, threshold=jaccard_threshold
        )
    )
    clusters = dedup.dedup_clusters(pairs)
    non_canonical = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    unique = exact.join(non_canonical, id_col, "left_anti")

    sampled = corpus.stratified_sample(
        unique, id_col, stratum_col, sample_rates or {}, default_rate
    )

    def _packed() -> DataFrame:
        with_tokens = sampled.withColumn(
            "n_tokens", token_count(F.col(text_col))
        )
        return corpus.pack_sequences(
            with_tokens, id_col, "n_tokens", token_budget
        )

    return CurationStages(
        {
            "metrics": metrics,
            "quality": quality,
            "clean": clean,
            "exact": exact,
            "unique": unique,
            "sampled": sampled,
        },
        {
            "packed": _packed,
            "shards": lambda: corpus.shuffle_shards(sampled, id_col, n_shards),
        },
        cached=[words_all, quality, exact],
    )
