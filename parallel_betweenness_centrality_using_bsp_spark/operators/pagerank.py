"""PageRank — power iteration as iterative DataFrame joins.

``pr'(v) = (1-d)/n + d * ( Σ_{u→v} pr(u)/outdeg(u) + dangling_mass/n )``

matching ``networkx.pagerank`` semantics (uniform teleport, dangling mass
redistributed uniformly); Σ pr == 1 is an invariant each iteration.

Scale notes:
  * ``edges × ranks`` is the big join; the edge table (with outdeg attached)
    is shuffled/partitioned by src ONCE and persisted — every iteration
    re-shuffles only the (n-vertex) rank vector, never the (m-edge) table.
  * contribution aggregation is a hash agg with map-side partial sums (the
    BSP combiner).
  * dangling mass is one tiny scalar agg per iteration.
  * convergence: L1 delta < tol (matching networkx's criterion, which uses
    tol * n ≈ sum of |diff|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import SuperstepRun, superstep_loop


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_supersteps: int = 60,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    num_partitions: int | None = None,
) -> SuperstepRun:
    """Returns run whose state is (vertex long, pr double)."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = vertices.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Edge table with outdeg attached, partitioned by src once, reused forever.
    edges_w = e.join(out_deg, "src").repartition(p, "src").persist()
    edges_w.count()
    dangling = vertices.join(
        e.select(F.col("src").alias("vertex")).distinct(), "vertex", "left_anti"
    ).persist()

    initial = vertices.withColumn("pr", F.lit(1.0 / n))

    def step(state: DataFrame, _k: int) -> DataFrame:
        dm_row = state.join(dangling, "vertex", "left_semi").agg(F.sum("pr")).collect()[0][0]
        dangling_mass = float(dm_row or 0.0)
        contribs = (
            state.join(edges_w, state.vertex == edges_w.src)
            .select(edges_w.dst.alias("vertex"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )
        return (
            vertices.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling_mass / n))
                ).alias("pr"),
            )
        )

    def converged(old: DataFrame, new: DataFrame) -> bool:
        l1 = (
            new.alias("a")
            .join(old.alias("b"), "vertex")
            .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr"))))
            .collect()[0][0]
        )
        return float(l1) < tol * n

    run = superstep_loop(
        spark,
        initial,
        step,
        algo="pagerank",
        max_supersteps=max_supersteps,
        converged_fn=converged,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
    )
    edges_w.unpersist()
    vertices.unpersist()
    dangling.unpersist()
    return run
