"""Skewed-graph (power-law / BA-tail) bench: evidence that the engine's
hub-safe plans win on genuinely skewed inputs at the 8M-edge scale.

Three row pairs, each skew-safe plan vs its naive formulation on the SAME
seeded power-law graph (`random_power_law_graph`, dst ~ Zipf, hub = id 0):

* **triangles**: degree-ordered orientation (the engine's plan — each
  undirected edge kept low→high by (deg, id), so a degree-d hub fans into
  at most its ORIENTED out-degree squared) vs the naive 2-path self-join
  on the symmetrized adjacency (hub fans d², the classic job-killer).
* **adamic_adar**: `max_neighbor_degree` hub pruning (documented knob)
  vs unpruned — the unpruned full-graph run is the d² blow-up itself.
* **salted agg**: `plans.skew.two_phase_sum` vs plain groupBy on the
  hub-keyed edge table (honest row: Spark's map-side combine already
  handles this shape at single-box scale — recorded to show the
  machinery's overhead is bounded, not to claim a win it doesn't have).

**Isolation**: each naive side runs in its OWN subprocess (own JVM, 4× the
engine side's driver heap) under a wall-clock budget. Two in-session
attempts established why: the naive 2-path join first exhausted the box's
~80 GB of free /tmp with shuffle spill (java.io.IOException: No space
left on device), then on retry OOM'd the shared local-mode JVM
(java.lang.OutOfMemoryError: Java heap space), killing every row after
it. In local mode an executor OOM IS a driver OOM, so no in-session guard
(job-group cancel, try/except) can survive it — the job-killer must be
quarantined in a process whose death is itself the measurement. Whatever
happens — finish, OOM, disk exhaustion, budget kill — is recorded as a
row, never hidden.

Writes SKEW_BENCH.json (appending attempts like scaling_bench;
incrementally after every row, so a crash still leaves evidence) and
prints one JSON line.  Box honesty: records loadavg_1m per row (shared
box, external load swings kernels 2-5x — see BASELINE.md methodology).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_VERT = 800_000
N_EDGE = 8_000_000
GAMMA = 2.5  # tail exponent: top hub degree ~1e4 at this size
NAIVE_BUDGET_S = 420.0
NAIVE_DRIVER_MEMORY = "32g"  # 4x the engine side's 8g: a naive DNF can't
                             # be blamed on a starved heap


def _graph(spark, scale: int = 1):
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import random_power_law_graph

    return random_power_law_graph(
        spark, N_VERT // scale, N_EDGE // scale, seed=42, gamma=GAMMA
    )


def _naive_triangles(spark, edges, cpus: str) -> int:
    from pyspark.sql import functions as F

    from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize

    und = symmetrize(edges).repartition(int(cpus), "src").persist()
    und.count()
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


def naive_child(tag: str) -> None:
    """Subprocess entry: run ONE naive formulation, print one JSON line."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import adamic_adar_scores
    from parallel_betweenness_centrality_using_bsp_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"skew-naive-{tag}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    if tag == "triangles_naive":
        count = _naive_triangles(spark, _graph(spark).persist(), cpus)
    elif tag == "triangles_naive_small":
        count = _naive_triangles(spark, _graph(spark, scale=4).persist(), cpus)
    elif tag == "adamic_adar_unpruned":
        count = adamic_adar_scores(_graph(spark), max_neighbor_degree=None).count()
    else:
        raise SystemExit(f"unknown naive tag {tag!r}")
    print(json.dumps({"sec": round(time.monotonic() - t0, 2), "count": count}))


def _run_naive(tag: str, out: dict) -> None:
    """Run a naive side quarantined in its own JVM; classify the outcome."""
    env = dict(os.environ, SPARK_DRIVER_MEMORY=NAIVE_DRIVER_MEMORY)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--naive", tag],
            capture_output=True,
            text=True,
            timeout=NAIVE_BUDGET_S,
            env=env,
            cwd=REPO,
        )
        elapsed = round(time.monotonic() - t0, 2)
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith('{"sec"')), None
        )
        if proc.returncode == 0 and line:
            row = json.loads(line)
            out[f"{tag}_sec"] = row["sec"]
            out[f"{tag}_count"] = row["count"]
            return
        err = proc.stderr or ""
        kind = (
            "jvm_oom"
            if "OutOfMemoryError" in err
            else "disk_exhausted" if "No space left" in err else "failed"
        )
        first = next(
            (
                l.strip()
                for l in err.splitlines()
                if "OutOfMemoryError" in l or "No space left" in l or "Error" in l
            ),
            f"exit code {proc.returncode}",
        )
        out[f"{tag}_sec"] = elapsed
        out[f"{tag}_dnf"] = kind
        out[f"{tag}_error"] = first[:300]
    except subprocess.TimeoutExpired:
        out[f"{tag}_sec"] = round(time.monotonic() - t0, 2)
        out[f"{tag}_dnf"] = "killed_wall_budget"
        out[f"{tag}_error"] = f"no result within {NAIVE_BUDGET_S:.0f}s; subprocess killed"


def _save(out: dict) -> None:
    """Incremental write: replace this run's attempt entry on each call."""
    path = os.path.join(REPO, "SKEW_BENCH.json")
    try:
        with open(path) as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {"attempts": []}
    attempts = [a for a in merged["attempts"] if a.get("run_id") != out["run_id"]]
    attempts.append(out)
    merged["attempts"] = attempts
    merged["latest"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)


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
        "run_id": f"{os.getpid()}-{int(time.time())}",
        "edges": m,
        "gamma": GAMMA,
        "top_hub_degree": int(top["d"]),
        "engine_driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "naive_driver_memory": NAIVE_DRIVER_MEMORY,
        "naive_budget_sec": NAIVE_BUDGET_S,
        "loadavg_1m": round(os.getloadavg()[0], 1),
    }

    # -- engine plans first (one shared session, 8g heap) ------------------
    t0 = time.monotonic()
    out["triangle_count"] = triangle_count(spark, g)
    out["triangles_oriented_sec"] = round(time.monotonic() - t0, 2)
    _save(out)

    t0 = time.monotonic()
    out["adamic_adar_pruned_pairs"] = adamic_adar_scores(
        g, max_neighbor_degree=256
    ).count()
    out["adamic_adar_pruned_sec"] = round(time.monotonic() - t0, 2)
    _save(out)

    g_small = _graph(spark, scale=4).persist()
    g_small.count()
    t0 = time.monotonic()
    out["triangle_count_small"] = triangle_count(spark, g_small)
    out["triangles_oriented_small_sec"] = round(time.monotonic() - t0, 2)
    g_small.unpersist()
    _save(out)

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
    g.unpersist()
    _save(out)

    # -- naive sides, quarantined (own JVM each, 32g heap, 420s budget) ----
    # The engine session stays up but idle; the child owns the box.
    for tag in ("triangles_naive_small", "triangles_naive", "adamic_adar_unpruned"):
        out["loadavg_before_" + tag] = round(os.getloadavg()[0], 1)
        _run_naive(tag, out)
        _save(out)

    out["loadavg_1m_end"] = round(os.getloadavg()[0], 1)
    _save(out)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--naive":
        naive_child(sys.argv[2])
    else:
        main()
