"""Multi-source BFS distances — the reference's per-source ``dist[]`` array
as a standalone operator (SURVEY.md §2 A6/A8/A9 surfaced directly).

Same superstep structure as the betweenness forward phase: one BFS level ==
one superstep; the frontier×edges hash join is the message exchange, the
per-level materialization is the barrier, small frontiers are broadcast.
State is keyed by (source, vertex) so a batch of sources advances in the
same wave of jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import IncrementalVisited
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats

_BROADCAST_FRONTIER_MAX = 500_000


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    directed: bool = False,
    num_partitions: int | None = None,
    max_depth: int | None = None,
) -> DataFrame:
    """(source long, vertex long, dist int) for every vertex reachable from
    each source (unreachable vertices are absent)."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst").dropDuplicates(["src", "dst"])
        if directed
        else symmetrize(edges)
    )
    e = e.repartition(p, "src").persist()
    e.count()

    frontier = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, vertex long, dist int"
    ).localCheckpoint(eager=True).transform(guard_stats)
    levels = [frontier]
    # O(1)-deep anti-join target at any depth (vs re-unioning all levels
    # every superstep = O(depth²) total scans on long-diameter graphs).
    visited = IncrementalVisited(frontier, ["source", "vertex"])
    d = 0
    while max_depth is None or d < max_depth:
        d += 1
        f = F.broadcast(frontier) if frontier.count() <= _BROADCAST_FRONTIER_MAX else frontier
        msgs = f.join(e, f.vertex == e.src).select("source", e.dst.alias("vertex"))
        new_frontier = (
            msgs.join(visited.df(), ["source", "vertex"], "left_anti")
            .distinct()
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        if new_frontier.isEmpty():
            break
        levels.append(new_frontier)
        visited.add(new_frontier)
        frontier = new_frontier

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    e.unpersist()
    return out


def double_sweep_diameter(
    spark: SparkSession,
    edges: DataFrame,
    *,
    start: int | None = None,
    directed: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """One-row (far_vertex, ecc_lb, n_reached): the double-sweep diameter
    lower bound (Magnien-Latapy-Habib) — BFS from a start vertex (minimum
    id by default), then BFS from the farthest vertex found (ties → lowest
    id); that vertex's eccentricity lower-bounds the diameter and is exact
    on trees.  Two BFS waves total, each the standard frontier plan; the
    only driver-side values are two scalar vertex ids.
    """
    if start is None:
        both = edges.select(F.col("src").alias("v")).unionByName(
            edges.select(F.col("dst").alias("v"))
        )
        start = both.agg(F.min("v")).first()[0]
    d1 = bfs_distances(
        spark, edges, [int(start)], directed=directed, num_partitions=num_partitions
    )
    far = d1.orderBy(F.desc("dist"), F.asc("vertex")).select("vertex").first()[0]
    d2 = bfs_distances(
        spark, edges, [int(far)], directed=directed, num_partitions=num_partitions
    )
    return d2.agg(
        F.lit(int(far)).cast("long").alias("far_vertex"),
        F.max("dist").alias("ecc_lb"),
        F.count(F.lit(1)).alias("n_reached"),
    )


def closeness_sampled(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    directed: bool = False,
    num_partitions: int | None = None,
    wf_improved: bool = True,
) -> DataFrame:
    """Sampled closeness centrality from incoming BFS distances.

    For each vertex v reached by k_v of the sampled sources at total
    distance S_v = Σ d(s, v)::

        closeness(v) = (k_v - [v ∈ sample]) / S_v

    optionally scaled by the Wasserman-Faust reached-fraction correction
    ``(k_v - 1) / (n - 1)`` (``wf_improved``, the NetworkX default) so
    scores are comparable across components.  With ``sources`` = every
    vertex on an undirected graph this IS ``networkx.closeness_centrality``
    (incoming and outgoing distances coincide); a sample gives the
    standard unbiased estimator shape, same rationale as sampled
    betweenness/harmonic.  One multi-source BFS wave + one aggregation —
    no new plan primitive.

    Returns ``(vertex long, reached long, closeness double)`` over
    vertices reached by ≥1 source at distance > 0.
    """
    d = bfs_distances(
        spark, edges, sources, directed=directed, num_partitions=num_partitions
    )
    n = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    pos = d.where(F.col("dist") > 0)
    agg = pos.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("reached"),
        F.sum("dist").alias("_s"),
    )
    base = F.col("reached").cast("double") / F.col("_s").cast("double")
    if wf_improved and n > 1:
        base = base * (F.col("reached").cast("double") / F.lit(float(n - 1)))
    return agg.select("vertex", "reached", base.alias("closeness"))


def shortest_path(
    spark: SparkSession,
    edges: DataFrame,
    src: int,
    dst: int,
    *,
    directed: bool = False,
    num_partitions: int | None = None,
    max_depth: int | None = None,
) -> DataFrame:
    """(pos int, vertex long) — ONE canonical shortest path from ``src`` to
    ``dst`` (empty if unreachable): the unique path obtained by always
    stepping to the MINIMUM-id predecessor, so the answer is deterministic
    in any engine (no tie luck).

    Plan: one multi-source-machinery BFS (single source) for dist; ONE join
    derives the canonical parent map — parent(v) = min{u : u→v,
    dist(u)+1 = dist(v)} — as a hash agg; then a length-of-path backtrack
    of 1-row broadcast lookups.  The backtrack is O(diameter) tiny jobs —
    the same round count any BSP kernel here pays — and the parent map it
    probes is vertex-keyed and persisted, never collected.  (For the
    all-paths "slice" rather than one path, filter dist_s(v) + dist_t(v) =
    dist(dst) instead — same machinery from both endpoints.)
    """
    dist = bfs_distances(
        spark,
        edges,
        [int(src)],
        directed=directed,
        num_partitions=num_partitions,
        max_depth=max_depth,
    ).select("vertex", "dist")
    target = dist.where(F.col("vertex") == dst).collect()
    if not target:
        return spark.createDataFrame([], "pos int, vertex long")
    plen = int(target[0]["dist"])

    e = (
        edges.select("src", "dst").dropDuplicates(["src", "dst"])
        if directed
        else symmetrize(edges)
    )
    du = dist.select(F.col("vertex").alias("src"), F.col("dist").alias("du"))
    dv = dist.select(F.col("vertex").alias("dst"), F.col("dist").alias("dv"))
    parents = (
        e.join(du, "src")
        .join(dv, "dst")
        .where(F.col("du") + 1 == F.col("dv"))
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.min("src").alias("parent"))
        .persist()
    )
    parents.count()

    path = [(plen, int(dst))]
    cur = int(dst)
    for pos in range(plen - 1, -1, -1):
        cur = int(
            parents.where(F.col("vertex") == cur).collect()[0]["parent"]
        )
        path.append((pos, cur))
    parents.unpersist()
    assert cur == int(src)
    return spark.createDataFrame(sorted(path), "pos int, vertex long")


def ego_network(
    spark: SparkSession,
    edges: DataFrame,
    seed: int,
    *,
    radius: int = 2,
    directed: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(members, induced_edges) of the radius-k ego network around ``seed``
    — the subgraph-sampling primitive a GNN training pipeline extracts per
    labeled node (GraphSAGE/PinSAGE neighborhoods).

    members: (vertex, dist) for dist ≤ radius (BFS hops, seed at 0);
    induced_edges: the edges with BOTH endpoints inside the ball.

    Plan: one depth-capped BFS wave (frontier joins — the bfs_distances
    kernel) + TWO semi joins to induce the edge set; the member table is
    ego-sized, so at 100 TB both semi joins broadcast the ball, never
    shuffling the full edge table.
    """
    members = bfs_distances(
        spark, edges, [int(seed)], directed=directed,
        num_partitions=num_partitions, max_depth=radius,
    ).select("vertex", "dist")
    e = edges.select("src", "dst")
    if not directed:
        from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize

        e = symmetrize(edges)
    mv = members.select("vertex")
    induced = e.join(
        F.broadcast(mv).withColumnRenamed("vertex", "src"), "src", "left_semi"
    ).join(F.broadcast(mv).withColumnRenamed("vertex", "dst"), "dst", "left_semi")
    return members, induced.select("src", "dst")


def closeness_weighted_sampled(
    spark: SparkSession,
    weighted_edges: DataFrame,
    sources: list[int],
    *,
    directed: bool = False,
    num_partitions: int | None = None,
    wf_improved: bool = True,
    max_hops: int = 60,
    delta_width: int | None = None,
) -> DataFrame:
    """``closeness_sampled`` over WEIGHTED distances: the identical
    aggregation fed by the frontier Bellman–Ford kernel (``operators.sssp``)
    instead of BFS hops.  ``weighted_edges`` is (src, dst, w) with strictly
    positive integral weights; ``max_hops`` caps relaxation rounds exactly
    as in ``betweenness_weighted`` (≥ the deepest shortest path's hop count
    for exact distances — each run also early-stops at its fixpoint).
    ``delta_width`` threads delta-stepping through to :func:`sssp` — same
    fixpoint, bucketed relaxation order (raise ``max_hops`` accordingly)."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.sssp import sssp

    d = sssp(
        spark,
        weighted_edges,
        [int(s) for s in sources],
        directed=directed,
        num_partitions=num_partitions,
        max_hops=max_hops,
        delta_width=delta_width,
    )
    n = (
        weighted_edges.select(F.col("src").alias("v"))
        .unionByName(weighted_edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    pos = d.where(F.col("dist") > 0)
    agg = pos.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("reached"),
        F.sum("dist").alias("_s"),
    )
    base = F.col("reached").cast("double") / F.col("_s").cast("double")
    if wf_improved and n > 1:
        base = base * (F.col("reached").cast("double") / F.lit(float(n - 1)))
    return agg.select("vertex", "reached", base.alias("closeness"))
