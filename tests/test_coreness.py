import networkx as nx
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.coreness import coreness, coreness_run
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import ba_graph, er_graph


def _got(spark, edges, **kw):
    return {
        r["vertex"]: r["core"]
        for r in coreness(spark, edge_df(spark, edges), **kw).collect()
    }


def test_coreness_matches_networkx_er(spark):
    edges = er_graph(n=120, p=0.05, seed=5)
    assert _got(spark, edges) == nx.core_number(nx.Graph(edges))


def test_coreness_matches_networkx_ba(spark):
    edges = ba_graph(n=100, m=4, seed=7)
    assert _got(spark, edges) == nx.core_number(nx.Graph(edges))


def test_coreness_clique_plus_pendants(spark):
    # K5 (core 4) with one pendant hanging off each clique vertex (core 1):
    # degree alone misranks the pendants' anchors; coreness does not.
    clique = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    pendants = [(u, u + 10) for u in range(5)]
    got = _got(spark, clique + pendants)
    assert all(got[u] == 4 for u in range(5))
    assert all(got[u + 10] == 1 for u in range(5))


def test_h_index_iterate_is_monotone_and_bounded(spark):
    # each fixed-round iterate is coordinate-wise <= the previous one and
    # >= the true core number (the sequence decreases ONTO the fixpoint)
    edges = ba_graph(n=80, m=3, seed=11)
    true = nx.core_number(nx.Graph(edges))
    prev = None
    for r in (1, 2, 4):
        it = _got(spark, edges, fixed_rounds=r)
        assert all(it[v] >= true[v] for v in it)
        if prev is not None:
            assert all(it[v] <= prev[v] for v in it)
        prev = it


def test_coreness_resume_mid_iteration(spark, tmp_path):
    from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import latest_checkpoint

    edges = ba_graph(n=60, m=3, seed=9)
    e = edge_df(spark, edges)
    ckpt = str(tmp_path / "ck")
    want = sorted(
        map(tuple, coreness_run(spark, e, fixed_rounds=4).state.collect())
    )

    coreness_run(spark, e, fixed_rounds=2, checkpoint_dir=ckpt, run_id="c")
    step, state = latest_checkpoint(spark, ckpt, "coreness", "c")
    assert step == 2
    resumed = coreness_run(
        spark, e, fixed_rounds=2, checkpoint_dir=ckpt, run_id="c",
        resume_state=state, start_step=step,
    )
    assert sorted(map(tuple, resumed.state.collect())) == want


def test_round1_equals_hindex_of_neighbor_degrees(spark):
    # independent per-vertex recomputation of round 1 in plain python
    edges = er_graph(n=60, p=0.08, seed=13)
    g = nx.Graph(edges)
    got = _got(spark, edges, fixed_rounds=1)

    def h_index(vals):
        vals = sorted(vals, reverse=True)
        return max((min(i + 1, v) for i, v in enumerate(vals)), default=0)

    for v in g.nodes():
        assert got[v] == h_index([g.degree(u) for u in g.neighbors(v)])
