"""Connected components over pair edges — the step after near-duplicate
PAIR detection: duplicates are transitive (A≈B, B≈C ⇒ {A,B,C} is one
group), so keep-one-per-cluster needs components, not pairs.

Implemented as DataFrame-native min-label propagation: every node starts
as its own label; each round a node adopts the minimum label among itself
and its neighbors; converged when no label changes. Rounds = graph
diameter — near-dup clusters are dense and shallow (diameter ≤ ~3), so
this terminates in a handful of joins. Each round is two hash joins + one
aggregation, all on (node, label) longs; the driver sees only the
converged-row COUNT per round (a scalar), never the data.

At 100 TB scale the same loop runs unchanged (labels/edges are shuffled by
node id); for adversarial high-diameter graphs switch to the large-star /
small-star variant (alternating min-propagation that contracts paths in
O(log n) rounds) — the round structure below is the building block.
Lineage is truncated with localCheckpoint every few rounds, the standard
guard for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, component) — component = the minimum node id reachable from
    ``node`` over undirected ``edges``. Isolated nodes (absent from edges)
    are the caller's concern: every node appearing in edges is labeled.

    Each round's labels are materialized with an EAGER localCheckpoint
    (default every round) before the convergence check: the check is an
    action, and without per-round materialization every round's action
    re-executed the whole un-truncated join chain since the last
    checkpoint — O(rounds²) join work in total (the r4 sweep's slowest
    query at toy scale). Eager checkpointing makes each round cost
    exactly one join+aggregate over materialized inputs, blocks are
    reclaimed by the ContextCleaner as old rounds are dropped, and the
    returned frame is a plain scan of the final round. Raising
    ``checkpoint_every`` re-introduces recompute between checkpoints —
    only worth it when rounds are cheaper than the checkpoint write."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for i in range(max_iter):
        # candidate labels: my own + each neighbor's current label
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank as DataFrame joins — (node, rank).

    Each iteration: contribution = rank/out_degree sent along every edge,
    new rank = (1-d)/N + d·Σ(contributions in). Two hash joins + one
    aggregation per round, all keyed on 8-byte node ids — the edge list is
    cached once and every shuffle is on the node id, so at 100 TB the cost
    is iterations × one edge-sized shuffle (partitioning is reused across
    rounds). Lineage is truncated with localCheckpoint like
    connected_components.

    Cross-engine determinism (the oracle contract): contribution sums are
    cast to DECIMAL(38,28) before aggregation — exact associative addition
    regardless of partition count or combine order — and every double op
    (division, damping blend) is a single IEEE-754 operation with identical
    operands on any engine. Dangling mass is NOT redistributed (nodes
    without out-edges absorb rank) — callers wanting classic PageRank on
    directed graphs should symmetrize or add sink edges; N is taken from
    the distinct node set of ``edges``.
    """
    e = edges.select(src, dst).distinct().cache()
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()  # one scalar to the driver: the algorithm's N
    rank = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iterations):
        contribs = (
            e.join(rank.withColumnRenamed("node", src), src)
            .join(deg, src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("_deg")).cast("decimal(38,28)").alias("_c"),
            )
        )
        rank = (
            nodes.join(contribs.groupBy("node").agg(F.sum("_c").alias("_s")), "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("_s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            rank = rank.localCheckpoint(eager=False)
    return rank


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → transitive duplicate clusters:
    (doc_id, cluster_id, cluster_size), cluster_id = min doc in the
    component, keep-candidate = the row where doc_id == cluster_id."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
        )
    )
