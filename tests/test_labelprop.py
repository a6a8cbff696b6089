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


def test_weighted_lpa_follows_heavy_edges(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import label_propagation
    from pyspark.sql import functions as F

    # star: center 0 with 3 light neighbors (w=1) and 1 heavy neighbor (w=10).
    # Unweighted LPA gives 0 the smallest neighbor label (1); weighted LPA
    # must adopt the heavy neighbor's label (4).
    e = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 10)], "src long, dst long, w long"
    )
    run_u = label_propagation(spark, e.select("src", "dst"), max_supersteps=1)
    run_w = label_propagation(spark, e, max_supersteps=1, weight_col="w")
    lab_u = {r["vertex"]: r["label"] for r in run_u.state.collect()}
    lab_w = {r["vertex"]: r["label"] for r in run_w.state.collect()}
    assert lab_u[0] == 1
    assert lab_w[0] == 4
    # leaves see only the center either way
    assert all(lab_w[v] == 0 for v in (1, 2, 3, 4))


def test_weighted_lpa_uniform_weights_match_unweighted(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import label_propagation
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df
    from pyspark.sql import functions as F

    from tests.oracles import er_graph

    edges = er_graph(n=50, p=0.1, seed=25)
    e = edge_df(spark, edges)
    plain = {
        r["vertex"]: r["label"]
        for r in label_propagation(spark, e, max_supersteps=3).state.collect()
    }
    w1 = {
        r["vertex"]: r["label"]
        for r in label_propagation(
            spark, e.withColumn("w", F.lit(1)), max_supersteps=3, weight_col="w"
        ).state.collect()
    }
    assert plain == w1


def test_community_centroids_exact(spark):
    import numpy as np

    from parallel_betweenness_centrality_using_bsp_spark.operators.features import (
        community_feature_centroids,
    )

    labels = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 9), (5, 9)], "vertex long, label long"
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 0.0]), (1, [3.0, 4.0, 0.0]), (2, [10.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )  # vertex 5 has no embedding: inner join drops it from label 9's stats
    got = {
        (r["label"], r["pos"]): (r["centroid"], r["size"])
        for r in community_feature_centroids(labels, emb, dims=2).collect()
    }
    assert got[(7, 0)] == (2.0, 2) and got[(7, 1)] == (3.0, 2)
    assert got[(9, 0)] == (10.0, 1) and got[(9, 1)] == (0.0, 1)
    assert len(got) == 4  # dims=2 per community, third dim excluded


def test_salted_argmax_matches_window_on_hot_key(spark):
    """One vertex holding ~50% of all edges (the hub shape that serializes
    the per-vertex window sort): the two-phase salted argmax must produce
    the IDENTICAL label assignment — same (count desc, label asc) total
    order, just computed as two hash aggregations."""
    hub = [(0, v) for v in range(1, 201)]
    rest = er_graph(n=200, p=0.02, seed=11)
    edges = hub + rest
    e = edge_df(spark, edges)
    plain = df_to_dict(
        label_propagation(spark, e, max_supersteps=4).state, "vertex", "label"
    )
    salted = df_to_dict(
        label_propagation(spark, e, max_supersteps=4, salt_buckets=8).state,
        "vertex", "label",
    )
    assert salted == plain
    assert plain == oracle_label_propagation(edges, max_iters=4)


def test_louvain_refines_lpa_to_optimal_on_ring_of_cliques(spark):
    """One-level Louvain local moves on a ring of 6 five-cliques: refining
    a mid-convergence LPA state (1 superstep, Q≈0.39) must strictly improve
    modularity — here it reaches the known optimum (Q = 49/66 ≈ 0.742, the
    clique-per-community partition networkx's louvain finds too)."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import (
        louvain_one_level,
        modularity,
    )

    edges = []
    K, C = 5, 6
    for c in range(C):
        base = c * K
        edges += [(base + a, base + b) for a in range(K) for b in range(a + 1, K)]
        edges.append((base + K - 1, ((c + 1) % C) * K))
    e = edge_df(spark, edges)

    lpa = label_propagation(spark, e, max_supersteps=1).state
    q_lpa = modularity(spark, e, lpa).first()["modularity"]
    refined = louvain_one_level(spark, e, labels=lpa, rounds=2)
    q_ref = modularity(spark, e, refined).first()["modularity"]
    assert q_ref > q_lpa
    assert abs(q_ref - 49.0 / 66.0) < 1e-9
    # determinism: identical rerun
    again = louvain_one_level(spark, e, labels=lpa, rounds=2)
    assert df_to_dict(again, "vertex", "label") == df_to_dict(refined, "vertex", "label")


def test_weighted_louvain_uniform_weights_equals_unweighted(spark):
    """w=3 on every edge scales 2m, k_v, k_{v,C}, Σtot by the same factor:
    every gain comparison — and therefore every label — is unchanged."""
    from pyspark.sql import functions as F

    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import louvain_one_level
    from tests.oracles import er_graph

    edges = er_graph(60, 0.08, seed=3)
    df = spark.createDataFrame([(u, v) for u, v in edges], "src long, dst long")
    wdf = df.withColumn("w", F.lit(3))
    a = {r["vertex"]: r["label"] for r in louvain_one_level(spark, df, rounds=2).collect()}
    b = {
        r["vertex"]: r["label"]
        for r in louvain_one_level(spark, wdf, rounds=2, weight_col="w").collect()
    }
    assert a == b


def test_weighted_louvain_heavy_edge_pulls_vertex(spark):
    """Two triangles {0,1,2} and {3,4,5} plus bridge 2-3: unweighted, 2
    stays with its triangle; with a dominating bridge weight, round-1's
    gain argmax moves 2 toward 3's community instead."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import louvain_one_level

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    wdf = spark.createDataFrame(
        [(u, v, 100 if (u, v) == (2, 3) else 1) for u, v in tri],
        "src long, dst long, w long",
    )
    udf_ = spark.createDataFrame(tri, "src long, dst long")
    uw = {r["vertex"]: r["label"] for r in louvain_one_level(spark, udf_, rounds=2).collect()}
    w = {
        r["vertex"]: r["label"]
        for r in louvain_one_level(spark, wdf, rounds=2, weight_col="w").collect()
    }
    # weighted: 2 and 3 end in the same community; unweighted they don't
    assert w[2] == w[3]
    assert uw[2] != uw[3]


def test_conductance_matches_networkx(spark):
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import conductance
    from tests.oracles import ba_graph

    edges = ba_graph(n=60, m=3, seed=43)
    g = nx.Graph(edges)
    # a fixed 3-way partition by vertex id
    labels = [(v, v % 3) for v in g.nodes()]
    ldf = spark.createDataFrame(labels, "vertex long, label long")
    got = {
        r["community"]: (r["volume"], r["cut"], r["conductance"])
        for r in conductance(spark, edge_df(spark, edges), ldf).collect()
    }
    for c in (0, 1, 2):
        S = {v for v, l in labels if l == c}
        vol = sum(g.degree(v) for v in S)
        cut = nx.cut_size(g, S)
        want_phi = cut / min(vol, 2 * g.number_of_edges() - vol)
        gv, gc, gphi = got[c]
        assert (gv, gc) == (vol, cut)
        assert abs(gphi - want_phi) < 1e-6
        assert abs(gphi - nx.conductance(g, S)) < 1e-6


def test_conductance_whole_graph_community_is_null(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.labelprop import conductance

    edges = [(0, 1), (1, 2)]
    ldf = spark.createDataFrame([(v, 7) for v in range(3)], "vertex long, label long")
    rows = conductance(spark, edge_df(spark, edges), ldf).collect()
    assert len(rows) == 1 and rows[0]["cut"] == 0 and rows[0]["conductance"] is None
