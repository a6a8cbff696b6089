from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import (
    complete_graph_edges,
    edge_df,
    two_triangles_edges,
)

from tests.oracles import ba_graph, df_to_dict, er_graph, oracle_triangle_count, oracle_triangles_per_vertex


def test_k5(spark):
    assert triangle_count(spark, edge_df(spark, complete_graph_edges(5))) == 10


def test_two_triangles(spark):
    assert triangle_count(spark, edge_df(spark, two_triangles_edges())) == 2


def test_er(spark):
    edges = er_graph(n=120, p=0.08, seed=11)
    assert triangle_count(spark, edge_df(spark, edges)) == oracle_triangle_count(edges)


def test_ba_skewed_per_vertex(spark):
    edges = ba_graph(n=200, m=3, seed=42)
    got = df_to_dict(triangles_per_vertex(spark, edge_df(spark, edges)), "vertex", "triangles")
    assert got == oracle_triangles_per_vertex(edges)


def test_local_clustering_matches_networkx(spark):
    import networkx as nx
    import numpy as np

    from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import (
        local_clustering_coefficients,
    )

    edges = ba_graph(n=150, m=3, seed=9)
    got = {
        r["vertex"]: (r["deg"], r["tri"], r["cc"])
        for r in local_clustering_coefficients(spark, edge_df(spark, edges)).collect()
    }
    g = nx.Graph(edges)
    want = nx.clustering(g)
    assert set(got) == {v for v in g if g.degree(v) >= 2}
    for v, (deg, _tri, cc) in got.items():
        assert deg == g.degree(v)
        assert np.isclose(cc, want[v], atol=1e-9)
