"""Weighted betweenness centrality — Brandes over WEIGHTED shortest paths,
the Dijkstra-flavored sibling of the BFS centerpiece (reference repo's
algorithm family; the checkout is empty so no file:line citations are
possible, per SURVEY.md §0).

Brandes' algorithm needs, per source s:

  1. ``dist``  — weighted shortest-path distances,
  2. ``sigma`` — shortest-path COUNTS,
  3. ``delta`` — reverse dependency accumulation
                 δ(v) = Σ_{w : v→w on a shortest path} σ(v)/σ(w) · (1 + δ(w)).

A literal distributed Dijkstra would serialize on its priority queue, so
every phase here is a BSP fixpoint of frontier-driven DataFrame joins —
the execution shape every other kernel in this engine uses:

* **dist**: frontier Bellman–Ford, exactly ``operators.sssp``'s relaxation
  (only improved rows send messages; converges to Dijkstra's answer for
  positive weights).
* **DAG**: one join pass — edge (u,v,w) is a shortest-path DAG edge iff
  ``dist(u) + w == dist(v)``.  Integral weights keep this equality exact
  in every engine (the 1e-6/exact twin-oracle rule).
* **sigma**: hop-indexed fixpoint over the DAG.  With strictly positive
  weights the DAG is acyclic and ``σ_k(v) = Σ_preds σ_{k-1}(u)`` (source
  pinned at 1) equals the number of shortest paths using ≤ k DAG edges —
  stationary once k reaches the deepest shortest path's hop count.  Only
  vertices whose σ changed last round send messages.
* **delta**: the same fixpoint run BACKWARD: ``δ_k(v) = Σ_succs
  σ(v)/σ(w) · (1 + δ_{k-1}(w))`` converges bottom-up in DAG-depth rounds.
  No per-distance-value driver loop: a 10^12-file graph has too many
  distinct distances to enumerate at the driver, while DAG depth is a
  round count like every other kernel's.

Scale notes: the weighted edge table is min-combined per (src, dst),
partitioned by src once, persisted; per-round shuffles carry only
frontier/changed rows keyed (source, vertex).  Sources run in batches like
``betweenness_bsp``, so state never exceeds |batch| × |V| rows.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import (
    BetweennessResult,
    _source_batches,
)


def _prepare_weighted_edges(
    spark: SparkSession, weighted_edges: DataFrame, directed: bool, p: int
) -> DataFrame:
    e = weighted_edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # parallel edges keep the MINIMUM weight (only the lightest can lie on a
    # shortest path; heavier parallels would corrupt sigma if kept)
    return (
        e.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )


def betweenness_weighted(
    spark: SparkSession,
    weighted_edges: DataFrame,
    *,
    sources: list[int] | None = None,
    directed: bool = False,
    batch_size: int = 64,
    max_hops: int = 60,
    num_partitions: int | None = None,
    estimate: bool = False,
) -> BetweennessResult:
    """Exact weighted Brandes partial sums over ``sources`` (default: all
    vertices).  ``weighted_edges`` is (src, dst, w) with STRICTLY POSITIVE
    integral weights — zero weights would put cycles in the "shortest-path
    DAG" and are rejected; integral weights keep dist/sigma arithmetic
    bit-exact so scores match a sequential Brandes at 1e-6 (float enters
    only in delta's σ-ratios, same as the reference).  ``max_hops`` caps
    every phase's rounds (≥ the hop count of the longest shortest path for
    exact results — each phase also early-stops at its fixpoint).
    Undirected scores are halved, matching
    ``networkx.betweenness_centrality(weight=..., normalized=False)``.
    ``estimate=True`` scales the sampled partial sums by n/|sources| —
    the Brandes-Pich 2007 unbiased estimator, identical to the unweighted
    paths' flag (betweenness.py).
    """
    t0 = time.monotonic()
    p = num_partitions or spark.sparkContext.defaultParallelism
    # Validate on the POST-CAST value: a fractional weight in (0, 1) passes a
    # raw `w <= 0` check but truncates to 0 under the long cast below,
    # recreating exactly the zero-weight cycle case this guard exists to
    # reject.  Non-integral weights are rejected outright (integral weights
    # are what keeps dist/sigma arithmetic bit-exact across engines).
    _w = F.col("w")
    bad = weighted_edges.where(
        (_w.cast("long") <= 0) | (_w.cast("double") != _w.cast("long").cast("double"))
    )
    if bad.limit(1).count():
        raise ValueError(
            "betweenness_weighted requires strictly positive INTEGRAL edge "
            "weights (w <= 0 or non-integral w found) — zero or fractional "
            "weights would corrupt shortest-path hop structure"
        )
    e = _prepare_weighted_edges(spark, weighted_edges, directed, p)
    e.count()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )

    total_steps = 0
    total_edges_traversed = 0
    n_sources = 0
    bc_acc: DataFrame | None = None

    # Default all-sources mode streams vertex-id batches via toLocalIterator
    # (the driver holds one batch, never the id universe) — same discipline
    # as the unweighted betweenness_bsp.
    for batch in _source_batches(vertices, sources, batch_size):
        n_sources += len(batch)
        src_df = spark.createDataFrame([(s,) for s in batch], "source long")

        # ---- phase 1: weighted distances (frontier Bellman–Ford) --------
        state = src_df.select(
            "source",
            F.col("source").alias("vertex"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(True).alias("improved"),
        ).localCheckpoint(eager=True)
        for _ in range(max_hops):
            frontier = state.where(F.col("improved"))
            if frontier.isEmpty():
                break
            cand = (
                frontier.join(e, frontier.vertex == e.src)
                .select(
                    "source",
                    e.dst.alias("vertex"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
                .groupBy("source", "vertex")
                .agg(F.min("dist").alias("dist"))
            )
            s_, c_ = state.alias("s"), cand.alias("c")
            better = F.col("s.dist").isNull() | (F.col("c.dist") < F.col("s.dist"))
            state = (
                s_.join(c_, ["source", "vertex"], "full_outer")
                .select(
                    "source",
                    "vertex",
                    F.when(F.col("c.dist").isNotNull() & better, F.col("c.dist"))
                    .otherwise(F.col("s.dist"))
                    .alias("dist"),
                    (F.col("c.dist").isNotNull() & better).alias("improved"),
                )
                .localCheckpoint(eager=True)
            )
            total_steps += 1
        dist = state.select("source", "vertex", "dist")

        # ---- shortest-path DAG: dist(u) + w == dist(v) ------------------
        du = dist.select("source", F.col("vertex").alias("src"), F.col("dist").alias("du"))
        dv = dist.select("source", F.col("vertex").alias("dst"), F.col("dist").alias("dv"))
        dag = (
            e.join(du, "src")
            .join(dv, ["source", "dst"])
            .where(F.col("du") + F.col("w") == F.col("dv"))
            .select("source", "src", "dst")
            .repartition(p, "source", "dst")
            .persist()
        )
        total_edges_traversed += dag.count()

        # ---- phase 2: sigma fixpoint over the DAG (hop-indexed) ---------
        sigma = dist.select(
            "source",
            "vertex",
            F.when(F.col("vertex") == F.col("source"), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("sigma"),
            # changed-marker drives the frontier: round k's messages come
            # only from rows whose sigma moved in round k-1
            (F.col("vertex") == F.col("source")).alias("chg"),
        ).localCheckpoint(eager=True)
        sigma_rounds = 0
        for _ in range(max_hops):
            changed = sigma.where(F.col("chg"))
            if changed.isEmpty():
                break
            # recompute the FULL pred-sum for every vertex with a changed
            # pred: partial increments would double-count across rounds
            # dag and sigma share lineage (both derive from dist) — alias
            # both sides of every dag×state join or Spark flags the common
            # exprIds as an ambiguous self-join
            ch, dg = changed.alias("ch"), dag.alias("dg")
            touched = (
                ch.join(
                    dg,
                    (F.col("ch.source") == F.col("dg.source"))
                    & (F.col("ch.vertex") == F.col("dg.src")),
                )
                .select(F.col("dg.source").alias("source"), F.col("dg.dst").alias("dst"))
                .distinct()
            )
            sums = (
                dag.join(touched, ["source", "dst"], "left_semi")
                .select("source", F.col("dst").alias("vertex"), F.col("src").alias("u"))
                .join(
                    sigma.select(
                        "source", F.col("vertex").alias("u"), F.col("sigma").alias("su")
                    ),
                    ["source", "u"],
                )
                .groupBy("source", "vertex")
                .agg(F.sum("su").alias("new_sigma"))
            )
            sg, sm = sigma.alias("g"), sums.alias("m")
            sigma = (
                sg.join(sm, ["source", "vertex"], "left")
                .select(
                    "source",
                    "vertex",
                    F.when(
                        F.col("m.new_sigma").isNotNull()
                        & (F.col("vertex") != F.col("source")),
                        F.col("m.new_sigma"),
                    )
                    .otherwise(F.col("g.sigma"))
                    .alias("sigma"),
                    (
                        F.col("m.new_sigma").isNotNull()
                        & (F.col("vertex") != F.col("source"))
                        & (F.col("m.new_sigma") != F.col("g.sigma"))
                    ).alias("chg"),
                )
                .localCheckpoint(eager=True)
            )
            total_steps += 1
            sigma_rounds += 1

        # ---- phase 3: delta fixpoint, backward over the DAG -------------
        # Round count is KNOWN, not detected: sigma's loop executes one
        # final no-change round before its emptiness break, so
        # ``sigma_rounds - 1`` IS the DAG depth, and delta propagated
        # leaf-up is stationary after exactly that many rounds.  Running
        # them blind drops the per-round convergence join + driver sync
        # the earlier code paid.
        #
        # The σ-ratio on each DAG edge never changes across delta rounds —
        # join sigma into the DAG ONCE (σ(u)/σ(w) per edge, persisted) so
        # the per-round plan is one join + one hash agg + the state merge,
        # instead of re-joining sigma at both endpoints every round.
        sv = sigma.select("source", "vertex", "sigma")
        su = sv.select(
            "source", F.col("vertex").alias("src"), F.col("sigma").alias("sigma_u")
        )
        sw = sv.select(
            "source", F.col("vertex").alias("dst"), F.col("sigma").alias("sigma_w")
        )
        dag_r = (
            dag.join(su, ["source", "src"])
            .join(sw, ["source", "dst"])
            .select(
                "source",
                "src",
                "dst",
                (F.col("sigma_u") / F.col("sigma_w")).alias("ratio"),
            )
            .repartition(p, "source", "dst")
            .persist()
        )
        delta = sv.select(
            "source", "vertex", F.lit(0.0).alias("delta")
        ).localCheckpoint(eager=True)
        for _ in range(min(max(sigma_rounds - 1, 0), max_hops)):
            # δ(v) = Σ_{w succ} σ(v)/σ(w) · (1 + δ(w)) — recomputed in full
            # each round; stationary once rounds reach the DAG depth
            dw = delta.select(
                "source", F.col("vertex").alias("dst"), F.col("delta").alias("delta_w")
            )
            contrib = (
                dag_r.join(dw, ["source", "dst"])
                .groupBy("source", F.col("src").alias("vertex"))
                .agg(
                    F.sum(F.col("ratio") * (F.lit(1.0) + F.col("delta_w"))).alias("d")
                )
            )
            delta = (
                sv.select("source", "vertex")
                .join(contrib, ["source", "vertex"], "left")
                .select(
                    "source", "vertex", F.coalesce("d", F.lit(0.0)).alias("delta")
                )
                .localCheckpoint(eager=True)
            )
            total_steps += 1
        dag_r.unpersist()

        batch_bc = (
            delta.where(F.col("vertex") != F.col("source"))
            .groupBy("vertex")
            .agg(F.sum("delta").alias("bc"))
        )
        bc_acc = (
            batch_bc
            if bc_acc is None
            else bc_acc.unionByName(batch_bc)
            .groupBy("vertex")
            .agg(F.sum("bc").alias("bc"))
        ).localCheckpoint(eager=True)
        dag.unpersist()

    scale = 1.0 if directed else 0.5
    if estimate:
        scale *= vertices.count() / max(n_sources, 1)
    bc = vertices.join(bc_acc, "vertex", "left").select(
        "vertex",
        (F.coalesce(F.col("bc"), F.lit(0.0)) * F.lit(scale)).alias("bc"),
    )
    e.unpersist()
    vertices.unpersist()
    return BetweennessResult(
        bc=bc,
        supersteps=total_steps,
        edges_traversed=total_edges_traversed,
        wall_s=time.monotonic() - t0,
    )
