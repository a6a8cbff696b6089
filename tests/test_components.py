from parallel_betweenness_centrality_using_bsp_spark.operators.components import connected_components
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df, two_triangles_edges

from tests.oracles import df_to_dict, er_graph, oracle_components


def test_two_components(spark):
    edges = two_triangles_edges() + [(6, 7)]
    run = connected_components(spark, edge_df(spark, edges))
    got = df_to_dict(run.state, "vertex", "label")
    assert got == oracle_components(edges)
    assert run.converged


def test_er_graph_exact(spark):
    edges = er_graph(n=200, p=0.02, seed=42)
    run = connected_components(spark, edge_df(spark, edges))
    got = df_to_dict(run.state, "vertex", "label")
    assert got == oracle_components(edges)


def test_path_graph_diameter(spark):
    edges = [(i, i + 1) for i in range(10)]
    run = connected_components(spark, edge_df(spark, edges))
    got = df_to_dict(run.state, "vertex", "label")
    assert set(got.values()) == {0}
