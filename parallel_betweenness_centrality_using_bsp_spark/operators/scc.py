"""Strongly connected components — the coloring (Orzan) algorithm as
nested BSP loops, the directed-graph sibling of connected components.

Outer round (on the still-unassigned subgraph):

  1. **Color propagation** (inner BSP loop): ``color(v)`` starts as ``v``
     and takes the max over itself and its in-neighbors' colors until the
     fixpoint — after it, ``color(v) = max(ancestors(v) ∪ {v})``.  This is
     the hash-max twin of the components kernel: one frontier-driven join +
     max-aggregation per superstep, only CHANGED colors propagate.
  2. **Pivots**: vertices with ``color(v) == v`` (no larger ancestor).
  3. **Backward reach** (inner BSP loop): from each pivot c, BFS along
     REVERSED edges restricted to color-class c.  Every reached vertex is
     in the SCC of c (it reaches c forward via the color certificate, and
     c reaches it backward) — all pivot classes expand in parallel in one
     joint frontier keyed by color.
  4. Assign those SCCs, induce the remaining subgraph, repeat.

Each outer round assigns ≥1 SCC per color class containing a pivot.
Colors are (xxhash64(vertex), vertex) PAIRS, max-compared
lexicographically: the hash component randomizes the pivot order so the
adversarial O(n)-round case (a chain whose ids decrease along the edges,
where plain vertex-id colors elect one pivot per round) becomes a
hash-order chain — expected O(log n) outer rounds on ANY id layout — and
the vertex component makes every color unique, so correctness never
depends on hash collisions.  SCC labels are still canonicalized to the
MINIMUM member id afterwards, so output is engine-independent and
identical to the unpermuted algorithm's.

All inner loops materialize per superstep (localCheckpoint) and move only
frontier-sized deltas; edges for the round are partitioned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    num_partitions: int | None = None,
    max_outer_rounds: int = 200,
) -> DataFrame:
    """(vertex long, scc long) — scc is the minimum vertex id in the
    vertex's strongly connected component.  Vertices are the src ∪ dst of
    the directed edge set; self-loops and parallel edges are tolerated."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    e_all = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
        .localCheckpoint(eager=True).transform(guard_stats)
    )
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True).transform(guard_stats)
    )

    assigned = spark.createDataFrame([], "vertex long, scc long")
    remaining = verts
    e = e_all

    for _ in range(max_outer_rounds):
        if remaining.isEmpty():
            break

        # -- 1. forward max-color propagation to fixpoint ------------------
        # color = struct(h = xxhash64(vertex), v = vertex): max over the
        # struct is lexicographic, so propagation order follows the HASH
        # (adversarial id orderings vanish) while the v field keeps every
        # color unique (no correctness-by-luck on 64-bit collisions).
        color = remaining.select(
            "vertex",
            F.struct(
                F.xxhash64(F.col("vertex")).alias("h"),
                F.col("vertex").alias("v"),
            ).alias("color"),
        )
        color = color.localCheckpoint(eager=True).transform(guard_stats)
        frontier = color  # rows whose color changed last superstep
        while True:
            msgs = (
                frontier.join(e, frontier.vertex == e.src)
                .select(e.dst.alias("vertex"), "color")
                .groupBy("vertex")
                .agg(F.max("color").alias("cand"))
            )
            c, m = color.alias("c"), msgs.alias("m")
            merged = (
                c.join(m, "vertex", "left")
                .select(
                    "vertex",
                    F.greatest(F.col("c.color"), F.col("m.cand")).alias("color"),
                    (F.col("m.cand") > F.col("c.color")).alias("_chg"),
                )
                .localCheckpoint(eager=True).transform(guard_stats)
            )
            frontier = merged.where(F.col("_chg")).select("vertex", "color")
            color = merged.select("vertex", "color")
            if merged.where(F.col("_chg")).isEmpty():
                break

        # -- 2/3. backward reach from pivots within each color class -------
        # member (vertex, color); pivot classes expand along reversed edges
        # restricted to same-color endpoints, all classes at once
        colored_e = (
            e.join(color.withColumnRenamed("vertex", "src").withColumnRenamed("color", "sc"), "src")
            .join(color.withColumnRenamed("vertex", "dst").withColumnRenamed("color", "dc"), "dst")
            .where(F.col("sc") == F.col("dc"))
            .select(F.col("dst").alias("r_src"), F.col("src").alias("r_dst"), F.col("sc").alias("color"))
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        scc_members = color.where(F.col("vertex") == F.col("color.v")).select(
            "vertex", "color"
        ).localCheckpoint(eager=True).transform(guard_stats)
        frontier = scc_members
        while not frontier.isEmpty():
            nxt = (
                frontier.join(
                    colored_e,
                    (frontier.vertex == colored_e.r_src)
                    & (frontier.color == colored_e.color),
                )
                .select(F.col("r_dst").alias("vertex"), colored_e.color.alias("color"))
                .distinct()
                .join(scc_members, ["vertex", "color"], "left_anti")
                .localCheckpoint(eager=True).transform(guard_stats)
            )
            frontier = nxt
            if not nxt.isEmpty():
                scc_members = scc_members.unionByName(nxt).localCheckpoint(eager=True).transform(guard_stats)

        # -- 4. canonicalize labels, peel, induce the rest -----------------
        labels = (
            scc_members.groupBy("color")
            .agg(F.min("vertex").alias("scc"))
            .join(scc_members, "color")
            .select("vertex", "scc")
        )
        assigned = assigned.unionByName(labels).localCheckpoint(eager=True).transform(guard_stats)
        remaining = remaining.join(labels.select("vertex"), "vertex", "left_anti").localCheckpoint(eager=True).transform(guard_stats)
        e = (
            e.join(labels.select(F.col("vertex").alias("src")), "src", "left_anti")
            .join(labels.select(F.col("vertex").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True).transform(guard_stats)
        )
    else:
        n_left = remaining.count()
        if n_left:
            # Partial labels would silently masquerade as complete output.
            raise ValueError(
                f"strongly_connected_components did not assign {n_left} "
                f"vertices within max_outer_rounds={max_outer_rounds} — "
                "raise the cap (hash-randomized colors make this "
                "vanishingly unlikely on non-degenerate graphs)"
            )

    return assigned


def condense(spark: SparkSession, edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(src long, dst long) — the SCC condensation DAG: every edge mapped
    to its endpoints' SCC labels, self-SCC edges dropped, deduplicated.
    ``labels`` is ``strongly_connected_components`` output."""
    return (
        edges.select("src", "dst")
        .join(labels.select(F.col("vertex").alias("src"), F.col("scc").alias("sa")), "src")
        .join(labels.select(F.col("vertex").alias("dst"), F.col("scc").alias("sb")), "dst")
        .where(F.col("sa") != F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def dag_longest_path_layers(
    spark: SparkSession,
    dag_edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(vertex long, layer long) — longest-path depth from any source of a
    DAG (layer 0 = no in-edges): the topological layering a build system
    schedules by.  Iterative max-propagation; only vertices whose layer
    grew last round send messages, so each round's work is frontier-sized
    and the round count is the DAG's longest path.  Input MUST be acyclic
    (feed the SCC condensation for arbitrary graphs) — a cycle would never
    converge, so rounds are capped and overrunning raises."""
    e = dag_edges.select("src", "dst").dropDuplicates(["src", "dst"]).localCheckpoint(eager=True).transform(guard_stats)
    verts = vertices or (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    layer = verts.select("vertex", F.lit(0).alias("layer")).localCheckpoint(eager=True).transform(guard_stats)
    frontier = layer
    for _ in range(max_rounds):
        msgs = (
            frontier.join(e, frontier.vertex == e.src)
            .select(e.dst.alias("vertex"), (F.col("layer") + 1).alias("cand"))
            .groupBy("vertex")
            .agg(F.max("cand").alias("cand"))
        )
        la, m = layer.alias("l"), msgs.alias("m")
        merged = (
            la.join(m, "vertex", "left")
            .select(
                "vertex",
                F.greatest(F.col("l.layer"), F.col("m.cand")).alias("layer"),
                (F.col("m.cand") > F.col("l.layer")).alias("_chg"),
            )
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        frontier = merged.where(F.col("_chg")).select("vertex", "layer")
        layer = merged.select("vertex", "layer")
        if frontier.isEmpty():
            return layer
    raise ValueError(
        f"dag_longest_path_layers did not converge in {max_rounds} rounds — "
        "is the input really acyclic? (condense() cyclic graphs first)"
    )
