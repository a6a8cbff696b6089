"""k-truss decomposition — edge-level peeling by triangle support, the
edge-strength sibling of k-core (cohesive-subgraph mining: a k-truss edge
sits in ≥ k−2 triangles, so trusses survive where loose hub fans don't).

One superstep = one peel round over the surviving SYMMETRIZED edge set:

    support(u,v) = |N(u) ∩ N(v)|      (wedge join: e ⋈ e on the shared
                                       endpoint, closed against e itself)
    keep (u,v) iff support ≥ k−2      (an edge in no wedge has support 0)

The wedge join is the triangle plan restricted to surviving edges; the
surviving-edge count is strictly decreasing until the fixpoint, so one
cheap count per round detects convergence, and ``fixed_rounds`` runs an
exact round count (the oracle-matched mode — after R rounds both engines
hold the identical R-times-peeled edge set).  Runs under
``plans.superstep.superstep_loop``: parquet checkpoints, mid-peel resume,
lineage + metrics.

Skew note: the wedge join fans a degree-d hub into O(d²) wedge rows per
round.  The un-oriented form is required here (support must count EVERY
common neighbor), so at web scale pair this with a degree cap or run
k-core first — peeling vertices below degree k−1 can never remove a
k-truss edge and shrinks hubs before the quadratic join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import SuperstepRun, superstep_loop


def k_truss_run(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    *,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    resume_state: DataFrame | None = None,
    start_step: int = 0,
) -> SuperstepRun:
    """Full superstep run; state is the surviving symmetrized edge set
    (src long, dst long)."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    initial = symmetrize(edges).repartition(p, "src")
    min_support = k - 2

    def step(cur: DataFrame, _round: int) -> DataFrame:
        a, b, x = cur.alias("a"), cur.alias("b"), cur.alias("x")
        sup = (
            x.join(a, F.col("x.src") == F.col("a.src"))
            .join(
                b,
                (F.col("x.dst") == F.col("b.src"))
                & (F.col("a.dst") == F.col("b.dst")),
            )
            .groupBy(F.col("x.src").alias("src"), F.col("x.dst").alias("dst"))
            .agg(F.count(F.lit(1)).alias("_sup"))
            .where(F.col("_sup") >= min_support)
            .select("src", "dst")
        )
        # inner-join back (not semi): sup already contains exactly the rows
        # of cur that survive — edges in NO wedge are absent (support 0)
        return sup

    def converged(old: DataFrame, new: DataFrame) -> bool:
        return new.count() == old.count()

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    if min_support <= 0:
        rounds = 0  # k ≤ 2: every edge is trivially in the truss — no peeling
    return superstep_loop(
        spark,
        resume_state if resume_state is not None else initial,
        step,
        algo="ktruss",
        max_supersteps=rounds,
        converged_fn=None if fixed_rounds is not None else converged,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        start_step=start_step,
        count_rows=False,
    )


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    *,
    max_rounds: int = 100,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src long, dst long): the undirected k-truss edge set, one row per
    direction (symmetrized), after peeling to the fixpoint (or exactly
    ``fixed_rounds`` rounds)."""
    return k_truss_run(
        spark,
        edges,
        k,
        max_rounds=max_rounds,
        fixed_rounds=fixed_rounds,
        num_partitions=num_partitions,
    ).state
