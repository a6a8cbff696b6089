import hashlib

import networkx as nx

from parallel_betweenness_centrality_using_bsp_spark.operators.anf import (
    anf_sketches,
    effective_diameter,
    neighborhood_estimates,
    neighborhood_function,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df
from tests.oracles import ba_graph, er_graph


def _h(v: int) -> int:
    # the md5_token_value twin: first 60 bits of md5("nf:<v>")
    return int(hashlib.md5(f"nf:{v}".encode()).hexdigest()[:15], 16)


def _balls(edges, hops):
    g = nx.Graph(edges)
    return {
        v: set(nx.single_source_shortest_path_length(g, v, cutoff=hops))
        for v in g
    }


def test_sketch_rows_are_k_smallest_ball_hashes(spark):
    edges = er_graph(n=60, p=0.05, seed=17)
    k = 8
    got = {}
    for r in anf_sketches(spark, edge_df(spark, edges), hops=2, k=k).collect():
        got.setdefault(r["vertex"], set()).add(r["h"])
    for v, ball in _balls(edges, 2).items():
        want = set(sorted(_h(u) for u in ball)[:k])
        assert got[v] == want, v


def test_estimates_exact_below_k(spark):
    # k larger than any ball -> the sketch IS the ball, estimate exact
    edges = er_graph(n=50, p=0.04, seed=3)
    sk = anf_sketches(spark, edge_df(spark, edges), hops=2, k=64)
    got = {
        r["vertex"]: r["ball_est"] for r in neighborhood_estimates(sk, 64).collect()
    }
    for v, ball in _balls(edges, 2).items():
        assert got[v] == float(len(ball)), v


def test_neighborhood_function_monotone_and_exact_when_unsaturated(spark):
    edges = ba_graph(n=80, m=2, seed=9)
    nf = {
        r["hop"]: r["nf_est"]
        for r in neighborhood_function(spark, edge_df(spark, edges), 3, k=128).collect()
    }
    assert nf[0] == 80.0
    assert nf[0] <= nf[1] <= nf[2] <= nf[3]
    want2 = sum(len(b) for b in _balls(edges, 2).values())
    assert nf[2] == float(want2)


def test_effective_diameter_path_graph(spark):
    # path 0-1-...-9: exact N(h) known; 90% mass needs most of the path
    edges = [(i, i + 1) for i in range(9)]
    d = effective_diameter(spark, edge_df(spark, edges), max_hops=9, k=64)
    nf = {h: sum(min(len(r), 999) for r in _balls(edges, h).values()) for h in range(10)}
    target = 0.9 * nf[9]
    want = min(h for h in range(10) if nf[h] >= target)
    assert d == want


def test_saturated_estimate_reasonable(spark):
    # k = 16 on a 200-vertex BA graph, hops = 3: balls far exceed k, the
    # KMV estimator must land within its coarse error envelope (not a
    # statistical test — the hash family is fixed, so this is deterministic)
    edges = ba_graph(n=200, m=3, seed=21)
    sk = anf_sketches(spark, edge_df(spark, edges), hops=3, k=16)
    got = {
        r["vertex"]: r["ball_est"] for r in neighborhood_estimates(sk, 16).collect()
    }
    balls = _balls(edges, 3)
    ratios = [got[v] / len(balls[v]) for v in balls if len(balls[v]) >= 32]
    assert ratios, "expected saturated vertices"
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.5


def test_harmonic_sketch_exact_when_unsaturated(spark):
    # k far above every ball size → the sketch IS the ball, so the
    # estimate equals truncated harmonic centrality Σ_{d(u,v) ≤ hops} 1/d
    from parallel_betweenness_centrality_using_bsp_spark.operators.anf import harmonic_sketch

    edges = er_graph(n=40, p=0.08, seed=31)
    hops = 3
    got = {
        r["vertex"]: r["harmonic_est"]
        for r in harmonic_sketch(spark, edge_df(spark, edges), hops=hops, k=512).collect()
    }
    g = nx.Graph(edges)
    for v in g.nodes:
        want = sum(
            1.0 / d
            for u, d in nx.single_source_shortest_path_length(g, v, cutoff=hops).items()
            if u != v and d > 0
        )
        assert abs(got[v] - want) < 1e-9, v


def test_harmonic_sketch_star_center(spark):
    # star: center reaches all n-1 leaves at d=1 (H=n-1); each leaf reaches
    # the center at 1 and the other n-2 leaves at 2
    from parallel_betweenness_centrality_using_bsp_spark.operators.anf import harmonic_sketch

    n = 12
    edges = [(0, i) for i in range(1, n)]
    got = {
        r["vertex"]: r["harmonic_est"]
        for r in harmonic_sketch(spark, edge_df(spark, edges), hops=2, k=64).collect()
    }
    assert abs(got[0] - (n - 1)) < 1e-9
    for v in range(1, n):
        assert abs(got[v] - (1.0 + (n - 2) / 2.0)) < 1e-9
