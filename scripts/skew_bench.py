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

    # -- adamic-adar: hub-pruned (cap 256), the engine plan ----------------
    t0 = time.monotonic()
    aa = adamic_adar_scores(g, max_neighbor_degree=256).count()
    out["adamic_adar_pruned_sec"] = round(time.monotonic() - t0, 2)
    out["adamic_adar_pruned_pairs"] = aa

    # -- naive sides, each guarded: the d^2 blow-up either finishes, runs
    #    out the wall-clock budget (job-group cancel), or runs the BOX out
    #    of shuffle-spill disk — whichever happens is recorded, per the
    #    module docstring. A first 8M-edge attempt genuinely exhausted the
    #    box's ~80 GB of free /tmp with 2-path shuffle spill (java.io.
    #    IOException: No space left on device) — that crash-log IS the
    #    skew story, so the guard exists to capture it as a row instead of
    #    dying with an empty SKEW_BENCH.json.
    def guarded(tag: str, budget_s: float, fn):
        import threading

        group = f"naive-{tag}"
        spark.sparkContext.setJobGroup(group, tag, interruptOnCancel=True)
        done = threading.Event()

        def reaper():
            if not done.wait(budget_s):
                spark.sparkContext.cancelJobGroup(group)

        t = threading.Thread(target=reaper, daemon=True)
        t.start()
        t0 = time.monotonic()
        try:
            val = fn()
            out[f"{tag}_sec"] = round(time.monotonic() - t0, 2)
            return val
        except Exception as exc:  # cancelled / out-of-disk / OOM — record it
            elapsed = round(time.monotonic() - t0, 2)
            msg = str(exc)
            kind = (
                "disk_exhausted"
                if "No space left" in msg
                else "cancelled_budget" if elapsed >= budget_s else "failed"
            )
            out[f"{tag}_sec"] = elapsed
            out[f"{tag}_dnf"] = kind
            out[f"{tag}_error"] = msg.splitlines()[0][:300]
            return None
        finally:
            done.set()
            spark.sparkContext.setJobGroup("", "")

    def naive_triangles(edges):
        und = symmetrize(edges).repartition(int(cpus), "src").persist()
        und.count()
        try:
            paths = (
                und.alias("e1")
                .join(und.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
                .where(F.col("e1.src") < F.col("e2.dst"))
                .select(
                    F.col("e1.src").alias("a"),
                    F.col("e1.dst").alias("b"),
                    F.col("e2.dst").alias("c"),
                )
            )
            return (
                paths.join(
                    und.select(F.col("src").alias("a"), F.col("dst").alias("c")),
                    ["a", "c"],
                    "left_semi",
                ).count()
                // 3  # each triangle found via all 3 middle vertices
            )
        finally:
            und.unpersist()

    out["triangle_count_naive"] = guarded(
        "triangles_naive", 420.0, lambda: naive_triangles(g)
    )
    out["adamic_adar_unpruned_pairs"] = guarded(
        "adamic_adar_unpruned",
        420.0,
        lambda: adamic_adar_scores(g, max_neighbor_degree=None).count(),
    )

    # Secondary pair at 1/4 the edges so the naive side can usually FINISH
    # and the reader gets a finite ratio too, not only the 8M DNF row.
    g_small = random_power_law_graph(
        spark, N_VERT // 4, N_EDGE // 4, seed=42, gamma=GAMMA
    ).persist()
    g_small.count()
    t0 = time.monotonic()
    out["triangle_count_small"] = triangle_count(spark, g_small)
    out["triangles_oriented_small_sec"] = round(time.monotonic() - t0, 2)
    out["triangle_count_naive_small"] = guarded(
        "triangles_naive_small", 420.0, lambda: naive_triangles(g_small)
    )
    g_small.unpersist()

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
