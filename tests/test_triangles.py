from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import (
    incremental_triangles,
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


def _new_tri(spark, base, delta):
    df = incremental_triangles(spark, edge_df(spark, base), edge_df(spark, delta))
    return df.collect()[0]["new_triangles"]


def test_incremental_single_closing_edge(spark):
    # path 0-1-2 plus delta edge (0,2) closes exactly one triangle
    assert _new_tri(spark, [(0, 1), (1, 2)], [(0, 2)]) == 1


def test_incremental_two_delta_edges_one_triangle(spark):
    # base edge (1,2); delta edges (0,1),(0,2) → one triangle, counted once
    # (the S2 pair-overcount correction path)
    assert _new_tri(spark, [(1, 2)], [(0, 1), (0, 2)]) == 1


def test_incremental_all_delta_triangle(spark):
    # empty-ish base, all 3 edges delta → the S3 path
    assert _new_tri(spark, [(7, 8)], [(0, 1), (1, 2), (0, 2)]) == 1


def test_incremental_duplicate_and_reversed_delta_ignored(spark):
    # delta edges already in the base (any orientation) create nothing
    assert _new_tri(spark, [(0, 1), (1, 2), (0, 2)], [(1, 0), (2, 1)]) == 0


def test_incremental_er_split_matches_cold(spark):
    # random 85/15 split: base cold count + incremental == cold full count
    edges = er_graph(n=120, p=0.08, seed=23)
    base = [e for e in edges if hash(e) % 100 < 85]
    delta = [e for e in edges if hash(e) % 100 >= 85]
    assert len(delta) > 10
    cold_full = oracle_triangle_count(edges)
    cold_base = triangle_count(spark, edge_df(spark, base))
    assert cold_base + _new_tri(spark, base, delta) == cold_full


def test_incremental_ba_hub_delta(spark):
    # delta edges incident to BA hubs exercise the low-degree-endpoint
    # expansion; equality with the cold recount is the contract
    edges = ba_graph(n=200, m=3, seed=5)
    base = edges[: len(edges) - 40]
    delta = edges[len(edges) - 40 :]
    cold_full = oracle_triangle_count(edges)
    cold_base = triangle_count(spark, edge_df(spark, base))
    assert cold_base + _new_tri(spark, base, delta) == cold_full


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
