import networkx as nx
import numpy as np

from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import adamic_adar_scores
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import er_graph


def test_adamic_adar_matches_networkx(spark):
    edges = er_graph(n=60, p=0.1, seed=17)
    got = {
        (r["a"], r["b"]): (r["cn"], r["aa"])
        for r in adamic_adar_scores(edge_df(spark, edges)).collect()
    }
    g = nx.Graph(edges)
    want = {
        (min(u, v), max(u, v)): s
        for u, v, s in nx.adamic_adar_index(g)
        if s > 0  # networkx enumerates ALL non-edges; we emit shared-neighbor pairs
    }
    assert set(got) == set(want)
    for k, s in want.items():
        assert np.isclose(got[k][1], s, atol=1e-9)
        assert got[k][0] == len(list(nx.common_neighbors(g, *k)))


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle + pendant: (0,1),(1,2),(0,2),(2,3) — every adjacent pair
    # shares a neighbor but must NOT be scored
    e = edge_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {(r["a"], r["b"]) for r in adamic_adar_scores(e).collect()}
    assert got == {(0, 3), (1, 3)}  # via shared neighbor 2 only


def test_adamic_adar_hub_pruning_logged(spark, caplog):
    import logging

    # hub 0 adjacent to everyone; pruning it removes all its pairs
    e = edge_df(spark, [(0, v) for v in range(1, 30)] + [(1, 2)])
    full = adamic_adar_scores(e).count()
    with caplog.at_level(
        logging.WARNING,
        logger="parallel_betweenness_centrality_using_bsp_spark.operators.linkpred",
    ):
        pruned = adamic_adar_scores(e, max_neighbor_degree=10)
        rows = pruned.collect()
    assert full > len(rows)
    # only w∈{1,2} (deg 2) survive as shared neighbors; their one candidate
    # pair (1,2) is an existing edge, and (0,v) pairs via 1 or 2 remain
    assert all(0 in (r["a"], r["b"]) for r in rows)
    assert any("pruned" in r.message for r in caplog.records)


def test_link_prediction_scores_match_networkx(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import link_prediction_scores

    edges = er_graph(n=50, p=0.12, seed=7)
    got = {
        (r["a"], r["b"]): r
        for r in link_prediction_scores(edge_df(spark, edges)).collect()
    }
    g = nx.Graph(edges)
    aa = {(min(u, v), max(u, v)): s for u, v, s in nx.adamic_adar_index(g) if s > 0}
    jc = {(min(u, v), max(u, v)): s for u, v, s in nx.jaccard_coefficient(g)}
    ra = {
        (min(u, v), max(u, v)): s
        for u, v, s in nx.resource_allocation_index(g)
        if s > 0
    }
    assert set(got) == set(aa)
    for k, r in got.items():
        assert np.isclose(r["aa"], aa[k], atol=1e-9), k
        assert np.isclose(r["jaccard"], jc[k], atol=1e-9), k
        assert np.isclose(r["ra"], ra[k], atol=1e-9), k
        assert r["cn"] == len(list(nx.common_neighbors(g, *k)))
