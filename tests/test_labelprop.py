from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import label_propagation
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df, two_triangles_edges

from tests.oracles import df_to_dict, er_graph, oracle_label_propagation


def test_two_triangles_exact(spark):
    edges = two_triangles_edges()
    run = label_propagation(spark, edge_df(spark, edges), max_supersteps=10)
    got = df_to_dict(run.state, "vertex", "label")
    assert got == oracle_label_propagation(edges, max_iters=10)


def test_er_exact(spark):
    edges = er_graph(n=80, p=0.06, seed=3)
    run = label_propagation(spark, edge_df(spark, edges), max_supersteps=7)
    got = df_to_dict(run.state, "vertex", "label")
    assert got == oracle_label_propagation(edges, max_iters=7)
