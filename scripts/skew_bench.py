"""Skewed-graph (power-law / BA-tail) bench: evidence that the engine's
hub-safe plans win on genuinely skewed inputs at the 8M-edge scale.

Three row pairs, each skew-safe plan vs its naive formulation on the SAME
seeded power-law graph (`random_power_law_graph`, dst ~ Zipf, hub = id 0):

* **triangles**: degree-ordered orientation (the engine's plan — each
  undirected edge kept low→high by (deg, id), so a degree-d hub fans into
  at most its ORIENTED out-degree squared) vs the naive 2-path self-join
  on the symmetrized adjacency (hub fans d², the classic job-killer).
* **adamic_adar**: `max_neighbor_degree` hub pruning (documented knob)
  vs unpruned on a capped subsample — the unpruned full-graph run is the
  d² blow-up itself, so the naive side runs on the same graph with the
  top-hub rows EXCLUDED from the timing comparison only if it exceeds
  the timeout; whatever happens is recorded, never hidden.
* **salted agg**: `plans.skew.two_phase_sum` vs plain groupBy on the
  hub-keyed edge table (honest row: Spark's map-side combine already
  handles this shape at single-box scale — recorded to show the
  machinery's overhead is bounded, not to claim a win it doesn't have).

Writes SKEW_BENCH.json (appending attempts like scaling_bench) and prints
one JSON line.  Box honesty: records loadavg_1m per row (shared box,
external load swings kernels 2-5x — see BASELINE.md methodology).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_VERT = 800_000
N_EDGE = 8_000_000
GAMMA = 2.5  # tail exponent: top hub degree ~1e4 at this size — the naive
             # d^2 side stays runnable (~1e8 2-paths) instead of 1e10+


def main() -> None:
    from pyspark.sql import functions as F

    from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import adamic_adar_scores
    from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
    from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import triangle_count
    from parallel_betweenness_centrality_using_bsp_spark.plans.skew import two_phase_sum
    from parallel_betweenness_centrality_using_bsp_spark.session import get_spark
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import random_power_law_graph

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("skew-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    g = random_power_law_graph(spark, N_VERT, N_EDGE, seed=42, gamma=GAMMA).persist()
    m = g.count()
    top = (
        symmetrize(g)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d"))
        .limit(1)
        .collect()[0]
    )
    out: dict = {
        "edges": m,
        "gamma": GAMMA,
        "top_hub_degree": int(top["d"]),
        "loadavg_1m": round(os.getloadavg()[0], 1),
    }

    # -- triangles: oriented (engine) vs naive symmetrized 2-path ---------
    t0 = time.monotonic()
    tri = triangle_count(spark, g)
    out["triangles_oriented_sec"] = round(time.monotonic() - t0, 2)
    out["triangle_count"] = tri

    und = symmetrize(g).repartition(int(cpus), "src").persist()
    und.count()
    t0 = time.monotonic()
    paths = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .where(F.col("e1.src") < F.col("e2.dst"))
        .select(F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c"))
    )
    naive = (
        paths.join(
            und.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
            "left_semi",
        ).count()
        // 3  # each triangle found via all 3 middle vertices (a<c fixed per b)
    )
    out["triangles_naive_sec"] = round(time.monotonic() - t0, 2)
    out["triangle_count_naive"] = naive
    und.unpersist()

    # -- adamic-adar: hub-pruned (cap 256) vs unpruned ---------------------
    t0 = time.monotonic()
    aa = adamic_adar_scores(g, max_neighbor_degree=256).count()
    out["adamic_adar_pruned_sec"] = round(time.monotonic() - t0, 2)
    out["adamic_adar_pruned_pairs"] = aa
    t0 = time.monotonic()
    aa_full = adamic_adar_scores(g, max_neighbor_degree=None).count()
    out["adamic_adar_unpruned_sec"] = round(time.monotonic() - t0, 2)
    out["adamic_adar_unpruned_pairs"] = aa_full

    # -- hub-keyed aggregation: two_phase_sum vs plain groupBy -------------
    vals = g.select("dst", F.lit(1.0).alias("v")).persist()
    vals.count()
    t0 = time.monotonic()
    plain = vals.groupBy("dst").agg(F.sum("v").alias("s")).count()
    out["agg_plain_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    salted = two_phase_sum(vals, ["dst"], {"s": "v"}).count()
    out["agg_two_phase_sec"] = round(time.monotonic() - t0, 2)
    assert plain == salted
    vals.unpersist()
    out["loadavg_1m_end"] = round(os.getloadavg()[0], 1)

    path = os.path.join(REPO, "SKEW_BENCH.json")
    try:
        with open(path) as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {"attempts": []}
    merged["attempts"].append(out)
    merged["latest"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
