"""Weighted single-source shortest paths — Bellman-Ford relaxation as BSP
supersteps (the weighted sibling of the BFS kernel; beyond the north-rule
algorithm list).

One superstep = one relaxation round: ``dist'(v) = min(dist(v), min over
in-edges (u,v) of dist(u) + w(u,v))`` — a hash join (state × persisted
weighted edges) plus a map-side-combined min aggregation, the exact plan
shape of the hash-min components kernel.  After k rounds the state holds
the minimum cost over paths of ≤ k hops; with ``max_hops ≥`` the graph's
hop-diameter and early stopping on the fixpoint it is exact SSSP.
Distances only decrease, so (row count, total cost) is a monotone
fingerprint — one cheap scan per round detects the fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sssp(
    spark: SparkSession,
    weighted_edges: DataFrame,
    sources: list[int],
    *,
    max_hops: int = 30,
    directed: bool = False,
    num_partitions: int | None = None,
    early_stop: bool = True,
) -> DataFrame:
    """(source long, vertex long, dist long) — min path cost from each
    source over paths of ≤ ``max_hops`` hops (exact SSSP once the fixpoint
    is reached; unreachable vertices are absent).

    ``weighted_edges`` is (src, dst, w) with non-negative integral weights
    (long) — integer costs keep every engine bit-exact.  ``early_stop=False``
    runs exactly ``max_hops`` rounds (the oracle-matched mode).
    """
    p = num_partitions or spark.sparkContext.defaultParallelism
    e = weighted_edges.select("src", "dst", "w")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # parallel edges keep the MINIMUM weight (dropDuplicates would pick one
    # arbitrarily — wrong for shortest paths)
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    e.count()

    state = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "source long, vertex long, dist long"
    ).localCheckpoint(eager=True)

    fingerprint = None
    for _ in range(max_hops):
        msgs = state.join(e, state.vertex == e.src).select(
            "source", e.dst.alias("vertex"), (F.col("dist") + F.col("w")).alias("dist")
        )
        state = (
            state.unionByName(msgs)
            .groupBy("source", "vertex")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if early_stop:
            row = state.agg(
                F.count(F.lit(1)).alias("c"), F.sum("dist").alias("s")
            ).first()
            fp = (row["c"], row["s"])
            if fp == fingerprint:
                break
            fingerprint = fp
    e.unpersist()
    return state
