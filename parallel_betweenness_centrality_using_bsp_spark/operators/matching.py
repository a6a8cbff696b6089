"""Maximal matching — parallel greedy with local-minimum edges.

The third classic BSP symmetry-breaking kernel, next to Luby MIS
(operators/mis.py) and Jones-Plassmann coloring (operators/coloring.py):
repeatedly, every live edge whose priority is the strict minimum among all
live edges touching either endpoint enters the matching, then both its
endpoints (and every edge on them) leave.  Locally-minimal edges are
vertex-disjoint by construction, so same-round picks never conflict —
the Israeli-Itai round structure, derandomized with a fixed priority
permutation (Blelloch, Fineman & Shun 2012 show the sequential-order
equivalence below makes greedy matching this parallelizable).

Priorities are DETERMINISTIC — ``md5('match:' || src || ':' || dst)`` with
the canonical edge appended as a tiebreak, the md5-family pattern shared
with MIS/coloring/MinHash — so the DuckDB twin replays the exact run
round for round, and the whole run equals the SEQUENTIAL greedy matching
that scans edges by ascending priority taking any edge with both
endpoints free (an edge is taken by sequential greedy iff it is a local
minimum after its priority-smaller neighbors are decided — induction on
priority order), which the pytest recomputes in plain python.

Per round: one unpivot (edge → two (vertex, prio) rows), one min
aggregation, one join back, two anti joins — hash ops on the live edge
set, nothing driver-side; expected O(log m) rounds under a random
permutation, and the ``rounds`` cap plus the ``live`` leftover make
partial progress explicit, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats


def _edge_priority(src, dst) -> "F.Column":
    key = F.concat(src.cast("string"), F.lit(":"), dst.cast("string"))
    return F.concat(
        F.md5(F.concat(F.lit("match:"), key)),
        F.lit(":"),
        F.lpad(src.cast("string"), 12, "0"),
        F.lit(":"),
        F.lpad(dst.cast("string"), 12, "0"),
    )


def greedy_matching(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src long, dst long, round int): matched pairs (canonical src < dst)
    with the round each was decided (1-based), plus — only when a
    ``rounds`` cap stopped the run before the fixpoint — the still-live
    edges as round −1 rows.  ``rounds=None`` iterates to the fixpoint
    (a true MAXIMAL matching: no live edge has both endpoints free)."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    live = (
        symmetrize(edges)
        .where(F.col("src") < F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .select(
            "src", "dst", _edge_priority(F.col("src"), F.col("dst")).alias("prio")
        )
        .localCheckpoint(eager=True).transform(guard_stats)
    )

    matched: list[DataFrame] = []
    k = 0
    while (rounds is None or k < rounds) and not live.isEmpty():
        k += 1
        ends = live.select(F.col("src").alias("vertex"), "prio").unionByName(
            live.select(F.col("dst").alias("vertex"), "prio")
        )
        vmin = ends.groupBy("vertex").agg(F.min("prio").alias("_m"))
        winners = (
            live.join(vmin.withColumnRenamed("vertex", "src"), "src")
            .where(F.col("prio") == F.col("_m"))
            .drop("_m")
            .join(vmin.withColumnRenamed("vertex", "dst"), "dst")
            .where(F.col("prio") == F.col("_m"))
            .select("src", "dst")
            .localCheckpoint(eager=True).transform(guard_stats)
        )
        if winners.isEmpty():
            break
        matched.append(
            winners.select("src", "dst", F.lit(k).alias("round"))
        )
        gone = winners.select(F.col("src").alias("vertex")).unionByName(
            winners.select(F.col("dst").alias("vertex"))
        )
        live = (
            live.join(gone.withColumnRenamed("vertex", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("vertex", "dst"), "dst", "left_anti")
            .select("src", "dst", "prio")
            .localCheckpoint(eager=True).transform(guard_stats)
        )

    out = live.select("src", "dst", F.lit(-1).alias("round"))
    for m in matched:
        out = out.unionByName(m)
    return out
