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


def test_modularity_matches_networkx(spark):
    import networkx as nx
    import numpy as np

    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import modularity
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

    # two cliques + one bridge: a clean 2-community partition
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    edges += [(0, 5)]
    labels = spark.createDataFrame(
        [(v, 0 if v < 5 else 1) for v in range(10)], "vertex long, label long"
    )
    row = modularity(spark, edge_df(spark, edges), labels).first()
    g = nx.Graph(edges)
    want = nx.community.modularity(g, [set(range(5)), set(range(5, 10))])
    assert row["n_communities"] == 2
    assert np.isclose(row["modularity"], want, atol=1e-9)
