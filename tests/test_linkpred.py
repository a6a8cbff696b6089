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


def _simrank_reference(edges, c=0.8, iters=2):
    """Pure-python truncated SimRank replay (ordered pairs incl. diagonal)."""
    ein = {}
    verts = set()
    for u, a in set(edges):
        if u == a:
            continue
        ein.setdefault(a, set()).add(u)
        verts.update((u, a))
    s = {(v, v): 1.0 for v in verts}
    for _ in range(iters):
        nxt = {(v, v): 1.0 for v in verts}
        for a in verts:
            for b in verts:
                if a == b or a not in ein or b not in ein:
                    continue
                m = sum(s.get((u, v), 0.0) for u in ein[a] for v in ein[b])
                if m:
                    nxt[(a, b)] = c * m / (len(ein[a]) * len(ein[b]))
        s = nxt
    return s


def test_simrank_matches_reference(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import simrank

    rng = np.random.default_rng(7)
    edges = list({(int(rng.integers(0, 25)), int(rng.integers(0, 25))) for _ in range(80)})
    edges = [(u, v) for u, v in edges if u != v]
    got = {
        (r["u"], r["v"]): r["s"]
        for r in simrank(spark, edge_df(spark, edges), c=0.8, iters=2).collect()
    }
    want = {k: v for k, v in _simrank_reference(edges, c=0.8, iters=2).items() if v > 0}
    assert set(got) == set(want)
    for k, v in want.items():
        assert np.isclose(got[k], v, atol=1e-9)
    # symmetry + unit diagonal invariants of the recurrence
    for (u, v), sv in got.items():
        if u != v:
            assert np.isclose(sv, got[(v, u)], atol=1e-12)
        else:
            assert sv == 1.0


def test_simrank_iter1_is_normalized_cocitation(spark):
    # one iteration from s0=I: s1(a,b) = c·|I(a)∩I(b)| / (|I(a)|·|I(b)|)
    from parallel_betweenness_centrality_using_bsp_spark.operators.linkpred import simrank

    #       0→2, 1→2, 0→3, 1→3, 4→3  : I(2)={0,1}, I(3)={0,1,4}
    e = edge_df(spark, [(0, 2), (1, 2), (0, 3), (1, 3), (4, 3)])
    got = {
        (r["u"], r["v"]): r["s"]
        for r in simrank(spark, e, c=0.8, iters=1).collect()
    }
    assert np.isclose(got[(2, 3)], 0.8 * 2 / (2 * 3), atol=1e-12)
    assert np.isclose(got[(3, 2)], 0.8 * 2 / (2 * 3), atol=1e-12)
    assert all(got[(v, v)] == 1.0 for v in (0, 1, 2, 3, 4))
