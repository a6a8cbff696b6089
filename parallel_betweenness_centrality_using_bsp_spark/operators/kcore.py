"""k-core decomposition — iterative peeling as BSP supersteps.

The k-core is the maximal subgraph where every vertex has degree ≥ k; it is
the standard graph-level quality/robustness filter (spam farms and
scrape-loop link tangles survive in high cores, long-tail pages don't).

One superstep = one peel round: degree aggregation over the surviving
induced edge set, then two semi-joins re-inducing it — all map-side-combined
hash operations on the edge table's own partitioning.  The survivor count is
strictly decreasing until the fixpoint, so one cheap count per round detects
convergence; ``fixed_rounds`` runs an exact round count instead (the
oracle-matched mode: after R rounds both engines hold the identical
R-times-peeled subgraph whether or not it has converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    *,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vertex long, deg long): vertices surviving k-core peeling with
    their degree in the peeled subgraph (symmetrized; degree counts each
    neighbor once)."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    cur = symmetrize(edges).repartition(p, "src").localCheckpoint(eager=True)
    last = None
    for _ in range(fixed_rounds if fixed_rounds is not None else max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("src")
        cur = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            c = cur.count()
            if c == last:
                break
            last = c
    return cur.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    )
