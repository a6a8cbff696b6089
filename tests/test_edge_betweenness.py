import networkx as nx
import numpy as np
import pytest

from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import edge_betweenness_bsp
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import er_graph


def _nx_edge_bc(edges, directed=False):
    g = (nx.DiGraph if directed else nx.Graph)()
    g.add_edges_from(edges)
    raw = nx.edge_betweenness_centrality(g, normalized=False)
    if directed:
        return {(u, v): s for (u, v), s in raw.items()}
    return {(min(u, v), max(u, v)): s for (u, v), s in raw.items()}


def test_edge_betweenness_matches_networkx_undirected(spark):
    edges = er_graph(n=40, p=0.12, seed=5)
    got = {
        (r["a"], r["b"]): r["ebc"]
        for r in edge_betweenness_bsp(spark, edge_df(spark, edges)).collect()
    }
    want = _nx_edge_bc(edges)
    assert set(got) == set(want)
    for k, s in want.items():
        assert np.isclose(got[k], s, atol=1e-6), k


def test_edge_betweenness_matches_networkx_directed(spark):
    edges = er_graph(n=30, p=0.15, seed=9)
    got = {
        (r["src"], r["dst"]): r["ebc"]
        for r in edge_betweenness_bsp(
            spark, edge_df(spark, edges), directed=True
        ).collect()
    }
    want = _nx_edge_bc(edges, directed=True)
    assert set(got) == set(want)
    for k, s in want.items():
        assert np.isclose(got[k], s, atol=1e-6), k


def test_edge_betweenness_path_graph(spark):
    # path 0-1-2-3: middle edge lies on 4 of the 6 shortest paths
    e = edge_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {(r["a"], r["b"]): r["ebc"] for r in edge_betweenness_bsp(spark, e).collect()}
    assert got == {(0, 1): pytest.approx(3.0), (1, 2): pytest.approx(4.0), (2, 3): pytest.approx(3.0)}


def test_edge_betweenness_bridge_dominates(spark):
    # two triangles joined by a bridge — the bridge edge carries all
    # cross-cluster paths (Girvan-Newman's split criterion)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = {
        (r["a"], r["b"]): r["ebc"]
        for r in edge_betweenness_bsp(spark, edge_df(spark, edges)).collect()
    }
    bridge = got[(2, 3)]
    assert bridge == max(got.values())
    assert set(got) == {(min(u, v), max(u, v)) for u, v in edges}


def test_edge_betweenness_source_subset_partial_sums(spark):
    # a source subset must equal the per-source partial sums the oracle
    # gate's SQL twin computes — cross-check against per-source NetworkX
    edges = er_graph(n=25, p=0.15, seed=11)
    sources = [0, 1, 2]
    got = {
        (r["a"], r["b"]): r["ebc"]
        for r in edge_betweenness_bsp(
            spark, edge_df(spark, edges), sources=sources
        ).collect()
    }
    g = nx.Graph(edges)
    want: dict[tuple[int, int], float] = {
        (min(u, v), max(u, v)): 0.0 for u, v in g.edges()
    }
    # per-source Brandes edge accumulation, summed over just the subset
    for s in sources:
        sub = nx.edge_betweenness_centrality_subset(
            g, sources=[s], targets=list(g.nodes()), normalized=False
        )
        for (u, v), val in sub.items():
            want[(min(u, v), max(u, v))] += val
    for k, s_ in want.items():
        assert np.isclose(got[k], s_, atol=1e-6), k
