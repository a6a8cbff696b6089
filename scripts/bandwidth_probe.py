"""Raw DRAM-bandwidth scaling probe (no Spark).

Measures the single-box hardware ceiling the saturated 8->32-core scaling
pair in ``scaling_bench.py`` runs into: each worker process does the same
random-gather numpy kernel PageRank's contribution scatter is bound by
(index into a float64 array the size of one superstep's working set), and
we report aggregate gathers/sec at 8 vs 32 processes.

The working-set size is a parameter because the ceiling moves with it:
per-core L3 share covers a small state array but not a 32M-edge one, so
the 8->32 efficiency of the RAW kernel falls as the working set grows —
the same direction the Spark rows move (0.52-0.55 at 8M edges, 0.34 at
32M).  A real cluster adds DRAM channels with every node and never enters
this regime; the 1->4 pair (unsaturated) is the representative one.

Usage: python scripts/bandwidth_probe.py [n_keys ...]   (default 4M, 32M)
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

SECONDS = 4.0


def _worker(n_keys: int, n_gathers: int, barrier, out_q: mp.Queue) -> None:
    rng = np.random.default_rng(7)
    state = rng.random(n_keys)  # float64 "rank" array, the shared hot state
    idx = rng.integers(0, n_keys, size=n_gathers)  # edge-destination pattern
    out = np.empty(n_gathers)  # preallocated: keeps the allocator (page
    # faults + zeroing of a fresh temp per call) out of the timed region —
    # without this the measurement mixes allocation bandwidth with gather
    # bandwidth and swings 3-5x run to run
    np.take(state, idx, out=out)  # warm pages OUTSIDE timing
    acc = float(out.sum())
    barrier.wait()  # all workers enter the timed region together
    done = 0
    t0 = time.monotonic()
    while (sec := time.monotonic() - t0) < SECONDS:
        np.take(state, idx, out=out)  # random gather
        acc += float(out.sum())
        done += n_gathers
    out_q.put(done / sec + 0.0 * acc)


def measure(procs: int, n_keys: int, n_gathers: int) -> float:
    """Aggregate gathers/sec across ``procs`` concurrent processes.

    A barrier releases every worker into a fixed-duration timed region at
    the same instant, so process-spawn skew can't fake (or hide) overlap."""
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [
        mp.Process(target=_worker, args=(n_keys, n_gathers, barrier, q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4_000_000, 32_000_000]
    out = {}
    for n_keys in sizes:
        n_gathers = 4_000_000
        # median of 3 alternating trials per level — turbo/thermal drift and
        # transient tenants move single readings; medians of interleaved
        # trials see the same box state
        los, his = [], []
        for _ in range(3):
            los.append(measure(8, n_keys, n_gathers))
            his.append(measure(32, n_keys, n_gathers))
        lo, hi = sorted(los)[1], sorted(his)[1]
        out[f"keys_{n_keys}"] = {
            "procs8_gathers_per_sec": round(lo, 0),
            "procs32_gathers_per_sec": round(hi, 0),
            "efficiency_8_to_32": round((hi / lo) / 4.0, 4),
            "state_mb": round(n_keys * 8 / 1e6, 1),
            "trials_8": [round(x, 0) for x in los],
            "trials_32": [round(x, 0) for x in his],
        }
        print(json.dumps({f"keys_{n_keys}": out[f"keys_{n_keys}"]}))
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
