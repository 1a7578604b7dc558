"""Graph analytics over similarity/duplicate pair relations.

The dedup family (dedup.py) produces pair relations (near-duplicate
edges); dedup_clusters gives connected components. PageRank adds the
next graph question a corpus pipeline asks of that graph: *which
documents are the most-connected hubs of a duplicate neighborhood* —
useful for picking cluster representatives by centrality rather than
min-id, and for down-weighting documents sitting inside dense
boilerplate cliques.

Scale shape: classic iterative PageRank — per iteration ONE shuffle of
the edge relation keyed on the source id (join with the current rank
relation, which is node-keyed), then a map-side-combined aggregation
keyed on the destination. The edge relation is symmetrized once and
localCheckpoint'ed, so every iteration starts from a constant-depth
plan (no lineage growth — the same discipline as dedup.dedup_clusters'
pointer-jumping loop). Nothing is collected to the driver except the
node count (a single long).

Determinism contract (the catalog oracle unrolls the same iterations as
a DuckDB CTE chain): per-edge contributions are floor(rank/deg · 1e12)
BIGINTs — floor of an identical double is unambiguous (no round-half
coincidence window at all), and bigint sums are exact and
order-independent — then one double division per node. Every float op
is a single IEEE op on identical inputs, so both engines produce
bit-identical ranks regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for per-edge contributions. Σ contributions ≤ 1e12
#: per node (ranks sum to ~1), so bigint sums cannot overflow.
SCALE = 1e12


def pagerank(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    damping: float = 0.85,
    iters: int = 5,
    round_dp: int = 6,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over an undirected pair relation → (node, rank).

    *pairs* holds one row per undirected edge (a < b convention is fine);
    the relation is symmetrized here, so every node has out-degree ≥ 1
    and the classic dangling-mass correction is unnecessary. Fixed
    *iters* power iterations with teleport (1-damping)/N. Ranks are
    rounded to *round_dp* dp at the end (stable across engines).

    With *weight_col* (e.g. the pair's jaccard), mass splits
    proportionally to edge weight instead of 1/deg: similarity-weighted
    centrality. Weights must be non-negative with a deterministic value
    (the dedup operators' 6-dp rounded scores qualify); per-source
    totals sum exactly as DECIMAL(18,6), and the per-edge share w/W is
    a single double division — the oracle discipline is unchanged.
    """
    wcols = [F.col(weight_col).alias("w")] if weight_col else []
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst"), *wcols
    )
    back = [F.col("w")] if weight_col else []
    edges = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), *back
            )
        )
        .distinct()
        .localCheckpoint()
    )
    if weight_col:
        deg = edges.groupBy("src").agg(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double").alias("deg")
        )
    else:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # fold the out-degree into the checkpointed edge relation ONCE: the
    # loop then joins each iteration's ranks against one static relation
    # instead of re-deriving deg + a second join every round (the r6
    # driver bench showed the weighted variant's single-run wobble came
    # from exactly this re-derived subtree)
    edges = edges.join(deg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # single scalar — the only driver-side value
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    teleport = (1.0 - damping) / float(n)  # same double both engines
    ranks = nodes.withColumn("rank", F.lit(1.0 / float(n)))
    # NB: the two arithmetic forms are kept verbatim per mode — the
    # oracles replay the exact op sequence (rank/deg vs rank·(w/W))
    contrib_c = (
        F.floor(F.col("rank") * (F.col("w") / F.col("deg")) * F.lit(SCALE))
        if weight_col
        else F.floor(F.col("rank") / F.col("deg") * F.lit(SCALE))
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), contrib_c.alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.sum("c").cast("double") / F.lit(SCALE))
                ).alias("rank")
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", round_dp).alias("rank"))


def triangle_count(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Single-row (n_triangles) of the undirected pair relation.

    The classic two-join oriented count: with every edge stored once as
    (lo < hi), a triangle {a < b < c} is counted exactly once as the
    wedge (a,b)+(b,c) closed by (a,c). Two equi-joins keyed on real
    columns — no enumeration of open wedges beyond the join's own
    matching, no driver state. At 100 TB-scale graphs the refinement is
    degree-based orientation (point each edge at the higher-degree
    endpoint) so hub vertices don't own O(deg²) wedges; with lo<hi
    orientation the skew bound is the max same-lo fan-out, which AQE
    skew-join splitting handles.
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        # the edge relation is consumed three times by the join chain —
        # materialize once so an expensive upstream pair-generation
        # pipeline (shingles/LSH) doesn't execute per reference
        .localCheckpoint()
    )
    wedge = e.select(F.col("lo").alias("a"), F.col("hi").alias("b")).join(
        e.select(F.col("lo").alias("b"), F.col("hi").alias("c")), "b"
    )
    closed = wedge.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("c")), ["a", "c"]
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def hop_distances(
    pairs: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    a_col: str = "id_a",
    b_col: str = "id_b",
    seed_col: str = "id",
) -> DataFrame:
    """(node, dist): BFS hop distance from the *seeds* set over the
    undirected pair relation, capped at *max_hops* (unreached nodes are
    absent). Per hop ONE edge-keyed join + a min aggregation — all
    integer arithmetic, so the catalog oracle unrolls the same hops as
    a CTE chain with exact equality. Frontier-style pruning is implicit:
    min() is monotone, so re-relaxing settled nodes is idempotent; the
    localCheckpoint keeps the per-hop plan constant-depth (the same
    discipline as pagerank/dedup_clusters).

    The classic use over the duplicate graph: "how close is this
    document to a known-bad seed set" — contamination blast-radius
    scoring beyond direct pairs.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    dist = seeds.select(F.col(seed_col).alias("node")).distinct().withColumn(
        "dist", F.lit(0).cast("long")
    )
    for _ in range(max_hops):
        relaxed = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist


def label_propagation(
    pairs: DataFrame,
    iters: int = 3,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """(node, community) by synchronous label propagation: each round a
    node adopts the most frequent label among its neighbors (ties → the
    smallest label). Where connected components answer "what touches
    what", LPA finds DENSE regions — boilerplate families inside a
    loosely chained duplicate blob.

    Fixed *iters* synchronous rounds (deterministic; the classic
    async/random variant is not replayable). All-integer: per round one
    edge-keyed join, a (node,label) count, and a node-keyed top-1
    window — the catalog oracle unrolls the identical rounds.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    for _ in range(iters):
        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("cnt"), F.asc("label")
        )
        labels = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels.withColumnRenamed("label", "community")


def kcore(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    k: int = 2,
    rounds: int = 8,
) -> DataFrame:
    """k-core of an undirected pair relation via *rounds* of synchronous
    peeling → (node, degree) for nodes surviving all rounds, with their
    degree inside the core. Each round removes every node of degree < k
    and its incident edges. Peeling is monotone: once a round removes
    nothing the graph is the true k-core and further rounds are the
    identity — so the fixed-round semantics match an early-converged run
    bit-for-bit, and an unrolled-SQL oracle with the same *rounds* is
    exact whether or not convergence happened.

    Scale shape: per round one degree aggregation (map-side combined)
    and two semi-join prunes keyed on the edge endpoints — the same
    shuffle pattern as one PageRank iteration; localCheckpoint keeps the
    plan constant-depth. The per-round edge count (a driver scalar, one
    long) doubles as the convergence early-stop."""
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    n_prev = edges.count()
    for _ in range(rounds):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
        n_now = edges.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
