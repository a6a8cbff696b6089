"""Maximal independent set — Luby's algorithm (Luby 1986, "A Simple
Parallel Algorithm for the Maximal Independent Set Problem"), the classic
BSP/superstep symmetry-breaking kernel (the same round structure
greedy graph coloring and correlation clustering build on).

Synchronous rounds over the undirected graph; all vertices start
*undecided*:

1. Every undecided vertex draws a priority.  Ours is DETERMINISTIC —
   ``md5('mis:' || vertex) || ':' || lpad(vertex)`` — a fixed random
   permutation rather than per-round coin flips.  md5 hex + bytewise
   string comparison are identical in every engine, so the DuckDB twin
   replays the exact run (the md5-family pattern used by MinHash/SimHash/
   walks).  The trailing vertex id makes priorities strictly unique.
2. An undecided vertex with a priority smaller than every undecided
   neighbor's joins the MIS (``in``).
3. Undecided neighbors of new MIS members leave (``out``).
4. Repeat until no vertex is undecided (or ``rounds`` is exhausted —
   the fixed-round form the oracle gate unrolls).

Per round: one frontier×edges hash join (the message exchange), one
min-aggregation, one anti join — the BSP superstep shape shared with
BFS/components; per-round state is one checkpointed DataFrame, nothing
driver-side.  A fixed priority permutation gives expected O(log n) rounds
on bounded-degree graphs (per-round, each undecided vertex that is a
local minimum leaves with its neighborhood); the ``rounds`` cap plus the
returned ``undecided`` rows make partial progress explicit, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats


def _priority(vcol) -> "F.Column":
    return F.concat(
        F.md5(F.concat(F.lit("mis:"), vcol.cast("string"))),
        F.lit(":"),
        F.lpad(vcol.cast("string"), 12, "0"),
    )


def luby_mis(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vertex long, status string, round int): ``in`` (MIS member) /
    ``out`` (dominated) with the round it was decided (1-based), or
    ``undecided`` with round −1 when a ``rounds`` cap stopped the run
    early.  ``rounds=None`` iterates to the fixpoint (a true MIS:
    independent AND maximal)."""
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
    decided: list[DataFrame] = []
    k = 0
    while rounds is None or k < rounds:
        k += 1
        # neighbor priorities, restricted to still-undecided endpoints
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
        dominated = (
            e.join(winners.withColumnRenamed("vertex", "src"), "src")
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(und.select("vertex"), "vertex", "left_semi")
            .join(winners, "vertex", "left_anti")
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        decided.append(
            winners.select("vertex", F.lit("in").alias("status"), F.lit(k).alias("round"))
        )
        decided.append(
            dominated.select(
                "vertex", F.lit("out").alias("status"), F.lit(k).alias("round")
            )
        )
        gone = winners.unionByName(dominated)
        und = und.join(gone, "vertex", "left_anti").localCheckpoint(eager=True).transform(guard_stats)
        if und.isEmpty():
            break

    out = und.select(
        "vertex", F.lit("undecided").alias("status"), F.lit(-1).alias("round")
    )
    for d in decided:
        out = out.unionByName(d)
    e.unpersist()
    return out
