import networkx as nx

from parallel_betweenness_centrality_using_bsp_spark.operators.sssp import sssp

from tests.oracles import er_graph


def _weighted(spark, edges):
    rows = [(u, v, (u + v) % 5 + 1) for u, v in edges]
    return spark.createDataFrame(rows, "src long, dst long, w long"), rows


def test_sssp_matches_dijkstra(spark):
    edges = er_graph(n=70, p=0.07, seed=6)
    e, rows = _weighted(spark, edges)
    got = {
        (r["source"], r["vertex"]): r["dist"]
        for r in sssp(spark, e, [0, 5], max_hops=100).collect()
    }
    g = nx.Graph()
    for u, v, w in rows:
        g.add_edge(u, v, weight=w)
    for s in (0, 5):
        want = nx.single_source_dijkstra_path_length(g, s)
        assert {v: d for (src, v), d in got.items() if src == s} == want


def test_sssp_bounded_hops(spark):
    # path 0-1-2 with heavy shortcut 0-2: within 1 hop the shortcut wins,
    # with 2 hops the cheaper 2-hop route takes over
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 10)], "src long, dst long, w long"
    )
    one = {r["vertex"]: r["dist"]
           for r in sssp(spark, e, [0], max_hops=1, early_stop=False).collect()}
    two = {r["vertex"]: r["dist"]
           for r in sssp(spark, e, [0], max_hops=2, early_stop=False).collect()}
    assert one[2] == 10 and two[2] == 2
