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
    # Convergence via the exact label-sum invariant (round 13): each round
    # sets label(n) = min(own, neighbors') — monotonically non-increasing
    # per node over a CONSTANT node set, so the decimal-exact label sum
    # strictly decreases iff ANY label changed. One map-side-combined
    # aggregate over the just-checkpointed frame replaces the old
    # join-the-previous-round + filter + count action (same answer, no
    # join, no second read of the previous round's blocks).
    _sum = lambda df: df.agg(  # noqa: E731 — exact: decimal, not double
        F.sum(F.col("label").cast("decimal(38,0)")).alias("_s")
    ).first()["_s"]
    prev_sum = _sum(labels)
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
            # LAZY checkpoint + the convergence aggregate as its
            # materializer: one job per round does both (the eager form
            # spent a second job materializing what the very next action
            # re-read). Lineage is still truncated once materialized.
            new_labels = new_labels.localCheckpoint(eager=False)
        new_sum = _sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # silent non-convergence returned PARTIALLY-propagated labels (a
        # 100-node path with max_iter=25 labeled node 99 with component 74)
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "graph diameter exceeds max_iter; raise it, or use "
            "connected_components_logstar (O(log n) rounds on any diameter)"
        )
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


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle census of an undirected graph (edges as distinct
    src < dst pairs): nodes, edges, wedges (open 2-paths), triangles, and
    global clustering coefficient 3·Δ/wedges.

    Degree-ordered node-iterator (the MapReduce-era standard — Suri &
    Vassilvitskii's "Counting triangles and the curse of the last
    reducer"): orient every edge from the (degree, id)-SMALLER endpoint to
    the larger, list wedges only at each edge's smaller endpoint, then
    semi-join wedges against oriented edges. Orientation bounds per-node
    oriented out-degree by O(sqrt(m)) on any graph, so no reducer sees a
    hub's full neighborhood — the skew-killer that makes this survive a
    100 TB power-law graph where naive wedge listing dies on the last
    reducer. Every join is an equi-join on node ids; each triangle is
    counted exactly once (its (deg,id)-minimum vertex lists the wedge).

    A plain SQL oracle can count the same triangles with id-ordered
    3-way joins — orientation changes the execution shape, not the set.
    """
    # e/deg/oriented each feed multiple consumers projecting different
    # columns, so exchange reuse does not fire and subtrees re-execute.
    # Persisting them IN the operator was measured 4× SLOWER cold at sf0.1
    # (InMemoryRelation loses stats → worse join strategies, and block
    # materialization costs more than the recompute) — so materialization
    # policy is the CALLER's: persist `edges` before calling when its
    # derivation is expensive (the registered query's co-purchase self-join
    # recomputes in ~1 s; a 100 TB caller would checkpoint it).
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    deg = (
        e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    # orient by the (degree, id) total order; carry the head's order key so
    # wedge endpoints can be ordered without re-joining degrees
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    w1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    w2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = w1.join(w2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"], "left_semi")

    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    counts = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return (
        counts.crossJoin(n_wedge).crossJoin(n_tri)
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.greatest(F.col("n_wedges"), F.lit(1)), 6
            ).alias("clustering_coeff"),
        )
    )


def connected_components_logstar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round variant min-label propagation
    (``connected_components``) needs for adversarial HIGH-DIAMETER graphs:
    label propagation walks one hop per round (a 1M-node path graph =
    1M rounds), star contraction halves path lengths every round.

    Per round, over the symmetrized neighbor lists:

      large-star: every u links its LARGER neighbors to
                  m = min(Γ(u) ∪ {u});
      small-star: every u links its smaller-or-self closure to
                  m = min(Γ⁻(u) ∪ {u}).

    Each is one window (min over the u-partition) + a projection — the
    shuffle carries (node, node) longs keyed by u. Rounds are eagerly
    localCheckpoint-ed (same recompute guard as ``connected_components``);
    convergence = the undirected edge set is a fixpoint, checked with two
    limit(1) anti-join probes (scalars to the driver, never data).

    Output matches ``connected_components`` exactly: component = min node
    id reachable; every node appearing in ``edges`` is labeled.
    """
    from pyspark.sql import Window

    E = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        sym = E.unionByName(E.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        w = Window.partitionBy("u")

        lmin = F.least(F.min("v").over(w), F.col("u"))
        large = (
            sym.withColumn("m", lmin)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

        small_nb = sym.filter(F.col("v") < F.col("u"))
        small_pairs = small_nb.withColumn("m", F.min("v").over(w))
        small = (
            small_pairs.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(
                small_pairs.select("u", F.col("m").alias("v")).distinct()
            )
        )

        E_new = (
            large.unionByName(small)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            E_new.exceptAll(E).limit(1).count() + E.exceptAll(E_new).limit(1).count()
        )
        E = E_new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_logstar did not reach an edge-set "
            f"fixpoint in {max_iter} rounds — raise max_iter (rounds are "
            "O(log n); the default covers graphs beyond 2^20 contraction "
            "depth, so this usually signals pathological input)"
        )

    comp = E.select(F.col("u").alias("node"), F.col("v").alias("component"))
    # every node appearing in `edges` is labeled — including nodes whose
    # only edge is a self-loop (dropped from E above), which min-label
    # labels as their own singleton component
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """k-core decomposition by parallel peeling: repeatedly delete every
    node with degree < k (all at once per round) until the remaining
    subgraph — the k-core — is stable. Returns (node, core_degree) for
    the surviving nodes; empty when the graph has no k-core.

    The standard community-core / spam-farm / robustness primitive. Each
    round is one degree aggregate + two anti-joins, all keyed on 8-byte
    node ids; rounds are eagerly localCheckpoint-ed (the same recompute
    guard as ``connected_components``), and the driver sees one scalar
    (does any weak node remain) per round. Parallel peeling converges to
    the same fixpoint as sequential peeling; rounds ≤ the graph's
    degeneracy ordering depth — raise ``max_iter`` for adversarial
    chains, and like the sibling operators it RAISES rather than return
    a partially-peeled graph.
    """
    E = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    E = E.unionByName(E.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    E = E.localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = E.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        weak = deg.filter(F.col("_d") < k).select("u")
        if weak.limit(1).count() == 0:
            break
        E = (
            E.join(weak, "u", "left_anti")
            .join(weak.withColumnRenamed("u", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"k_core did not stabilize in {max_iter} peeling rounds — "
            "raise max_iter (rounds are bounded by the peeling depth)"
        )
    return (
        E.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .select(F.col("u").alias("node"), "core_degree")
    )
