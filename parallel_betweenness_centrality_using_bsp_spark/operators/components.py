"""Connected components — hash-min label propagation over BSP supersteps.

Semantics: undirected connectivity; every vertex ends labeled with the
MINIMUM vertex id reachable from it.  Exact-match requirement
(BASELINE.json north_rule: "component/label assignments exact") — min over
longs is associative/commutative, so distributed execution is bit-exact.

Superstep: ``label'(v) = min(label(v), min over in-neighbors u of label(u))``
on the symmetrized edge table — one hash join (state × edges, edges side
persisted + pre-partitioned once) plus one hash aggregation (map-side partial
min then final min: the BSP "message combining" for free).

Convergence: labels only ever decrease, so ``sum(label)`` strictly decreases
on any change — a single cheap scan per superstep instead of a self-join
diff.  Rounds = O(graph diameter); for web-scale diameters consider the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) as an upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import SuperstepRun, superstep_loop


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_supersteps: int = 100,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    num_partitions: int | None = None,
    resume_state: DataFrame | None = None,
    start_step: int = 0,
) -> SuperstepRun:
    """Returns run whose state is (vertex long, label long).

    ``resume_state``/``start_step`` restart a checkpointed run mid-iteration.
    """
    p = num_partitions or spark.sparkContext.defaultParallelism
    und = symmetrize(edges).repartition(p, "src").persist()

    vertices = (
        und.select(F.col("src").alias("vertex"))
        .distinct()
    )
    initial = vertices.withColumn("label", F.col("vertex"))

    # Convergence via the monotone label-sum invariant.
    last_sum = {"v": None}

    def step(state: DataFrame, _k: int) -> DataFrame:
        msgs = (
            state.join(und, state.vertex == und.src)
            .select(und.dst.alias("vertex"), "label")
        )
        return (
            state.select("vertex", "label")
            .unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("label").alias("label"))
        )

    def converged(_old: DataFrame, new: DataFrame) -> bool:
        s = new.agg(F.sum("label")).collect()[0][0]
        done = last_sum["v"] == s
        last_sum["v"] = s
        return done

    run = superstep_loop(
        spark,
        resume_state if resume_state is not None else initial,
        step,
        algo="connected_components",
        max_supersteps=max_supersteps,
        converged_fn=converged,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        start_step=start_step,
    )
    und.unpersist()
    return run
