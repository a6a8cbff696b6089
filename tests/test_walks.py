from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.walks import random_walks
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import er_graph


def test_walks_deterministic_and_valid(spark):
    edges = er_graph(n=60, p=0.1, seed=4)
    eset = set()
    for u, v in edges:
        eset.add((u, v))
        eset.add((v, u))
    e = edge_df(spark, edges)
    starts = spark.createDataFrame([(i,) for i in range(10)], "vertex long")
    a = random_walks(spark, e, starts, walk_length=5).collect()
    b = random_walks(spark, e, starts, walk_length=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_walk = {}
    for r in a:
        by_walk.setdefault(r["walk_id"], {})[r["pos"]] = r["vertex"]
    for wid, steps in by_walk.items():
        assert steps[0] == wid
        for k in range(1, max(steps) + 1):
            assert (steps[k - 1], steps[k]) in eset  # every hop is a real edge


def test_walks_stop_at_sinks(spark):
    # directed path 0->1->2: walks from 0 must stop at vertex 2
    e = edge_df(spark, [(0, 1), (1, 2)])
    starts = spark.createDataFrame([(0,)], "vertex long")
    rows = random_walks(spark, e, starts, walk_length=5, directed=True).collect()
    got = {r["pos"]: r["vertex"] for r in rows}
    assert got == {0: 0, 1: 1, 2: 2}  # no pos 3+: the walk died at the sink
