"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction this
runs the SAME job on the SAME input at two parallelism levels — local[8] and
local[32] (this host has 32 logical CPUs) — and reports throughput at both
plus efficiency = (thr_32 / thr_8) / 4.  Each level runs in a fresh JVM
(subprocess) so executor-thread pools don't leak between measurements.

Also reports the fixed-core partition-count scaling (N vs 4N shuffle
partitions at local[32]) which isolates the engine's partitioning behavior
from single-box memory-bandwidth limits.

Writes results into BENCH_SCALING.json and prints a markdown row for
BASELINE.md.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from parallel_betweenness_centrality_using_bsp_spark.session import get_spark
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import random_uniform_graph
from parallel_betweenness_centrality_using_bsp_spark.operators.pagerank import pagerank
from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import betweenness_csr

cores = %(cores)d
parts = %(parts)d
spark = get_spark("scaling", master=f"local[{cores}]", shuffle_partitions=parts)
spark.sparkContext.setLogLevel("ERROR")

g = random_uniform_graph(spark, 100_000, 1_000_000, seed=42, partitions=parts).persist()
m = g.count()

t0 = time.monotonic()
run = pagerank(spark, g, tol=0.0, max_supersteps=10, num_partitions=parts)
pr_sec = time.monotonic() - t0

t0 = time.monotonic()
res = betweenness_csr(spark, g, sources=list(range(64)))
bc_sec = time.monotonic() - t0

print("RESULT " + json.dumps({
    "cores": cores, "partitions": parts, "edges": m,
    "pagerank_10iter_sec": round(pr_sec, 2),
    "pagerank_iters_per_sec": round(10 / pr_sec, 4),
    "betweenness_64src_sec": round(bc_sec, 2),
    "bc_edges_traversed_per_sec": round(res.edges_traversed / bc_sec, 1),
}))
"""


def run_level(cores: int, parts: int) -> dict:
    code = CHILD % {"repo": REPO, "cores": cores, "parts": parts}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    # Core scaling: same input, 8 vs 32 threads (the N vs 4N stand-in).
    lo = run_level(8, 32)
    hi = run_level(32, 32)
    # Partition scaling at fixed cores: 8 vs 32 shuffle partitions.
    plo = run_level(32, 8)

    def eff(metric: str) -> float:
        return round((hi[metric] / lo[metric]) / 4.0, 4)

    result = {
        "core_scaling": {
            "local8": lo,
            "local32": hi,
            "efficiency_pagerank": eff("pagerank_iters_per_sec"),
            "efficiency_betweenness": eff("bc_edges_traversed_per_sec"),
        },
        "partition_scaling_fixed_cores": {
            "parts8": plo,
            "parts32": hi,
            "speedup_pagerank": round(
                hi["pagerank_iters_per_sec"] / plo["pagerank_iters_per_sec"], 4
            ),
        },
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
