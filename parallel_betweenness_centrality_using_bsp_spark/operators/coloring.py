"""Distributed greedy graph coloring — Jones & Plassmann 1993 ("A parallel
graph coloring heuristic"), the BSP sibling of Luby MIS: instead of
deciding membership, each round's priority-local-minima pick the smallest
color unused by their already-colored neighbors (the "mex").

Synchronous rounds over the undirected graph; all vertices start
*uncolored*:

1. Priorities are the DETERMINISTIC md5 permutation
   ``md5('col:' || v) || ':' || lpad(v)`` — engine-portable strings
   (the md5-family pattern shared with MIS/MinHash/walks), so a DuckDB
   twin replays the exact run round for round.
2. An uncolored vertex whose priority is smaller than every uncolored
   neighbor's colors itself THIS round (the same local-minimum rule as
   MIS — each round's winner set is independent, so same-round winners
   can never conflict).
3. A winner's color is the mex of its already-colored neighbors' colors:
   sort the distinct neighbor colors, count the prefix where
   ``arr[i] == i`` — an all-JVM array expression, no UDF.  mex ≤ deg(v),
   so the palette never exceeds Δ+1 colors.
4. Repeat until every vertex is colored (or ``rounds`` is exhausted —
   the fixed-round form the oracle gate unrolls; the remainder comes
   back explicitly as ``color = -1``).

Per round: one frontier×edges join + min-agg (the winner election — the
identical message shape as MIS), one edges×colored join + collect_set
(the palette lookup, keyed by winner — bounded by the winner set, not the
graph), one anti join.  State per round is one checkpointed DataFrame;
nothing is ever driver-side.  Expected O(log n) rounds on bounded-degree
graphs, same argument as Luby.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats


def _priority(vcol) -> "F.Column":
    return F.concat(
        F.md5(F.concat(F.lit("col:"), vcol.cast("string"))),
        F.lit(":"),
        F.lpad(vcol.cast("string"), 12, "0"),
    )


def _mex(sorted_colors) -> "F.Column":
    """Smallest non-negative int absent from a sorted distinct int array:
    the length of the prefix where arr[i] == i (after the first gap the
    strictly-increasing values can never re-align with their index)."""
    return F.coalesce(
        F.size(F.filter(sorted_colors, lambda x, i: x == i)), F.lit(0)
    )


def jones_plassmann_coloring(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vertex long, color int, round int): greedy coloring with the round
    each vertex was decided (1-based); ``color = -1, round = -1`` rows mark
    vertices a ``rounds`` cap left uncolored (never silent).
    ``rounds=None`` iterates to the fixpoint — a proper coloring of every
    vertex using at most Δ+1 colors."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    e = symmetrize(edges).repartition(p, "src").persist()
    e.count()

    und = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .select("vertex", _priority(F.col("vertex")).alias("prio"))
        .localCheckpoint(eager=True).transform(guard_stats)
    )
    colored = spark.createDataFrame([], "vertex long, color int, round int")
    k = 0
    while rounds is None or k < rounds:
        k += 1
        nbr = und.select(F.col("vertex").alias("src"), F.col("prio").alias("_np"))
        msgs = (
            e.join(nbr, "src")
            .select(F.col("dst").alias("vertex"), "_np")
            .join(und.select("vertex"), "vertex", "left_semi")
        )
        nbr_min = msgs.groupBy("vertex").agg(F.min("_np").alias("_m"))
        winners = (
            und.join(nbr_min, "vertex", "left")
            .where(F.col("_m").isNull() | (F.col("prio") < F.col("_m")))
            .select("vertex")
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        if winners.isEmpty():
            break
        palette = (
            e.join(winners.select(F.col("vertex").alias("src")), "src", "left_semi")
            .join(
                colored.select(F.col("vertex").alias("dst"), "color"), "dst"
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.array_sort(F.collect_set("color")).alias("_cs"))
        )
        newly = (
            winners.join(palette, "vertex", "left")
            .select(
                "vertex",
                _mex(F.col("_cs")).alias("color"),
                F.lit(k).alias("round"),
            )
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=True).transform(guard_stats)
        und = und.join(newly, "vertex", "left_anti").localCheckpoint(eager=True).transform(guard_stats)
        if und.isEmpty():
            break

    out = colored.unionByName(
        und.select(
            "vertex", F.lit(-1).alias("color"), F.lit(-1).alias("round")
        )
    )
    e.unpersist()
    return out
