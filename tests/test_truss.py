import networkx as nx

from parallel_betweenness_centrality_using_bsp_spark.operators.truss import k_truss, k_truss_run
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import ba_graph, er_graph


def _got(spark, edges, k):
    return {
        (r["src"], r["dst"]) for r in k_truss(spark, edge_df(spark, edges), k).collect()
    }


def _want(edges, k):
    t = nx.k_truss(nx.Graph(edges), k)
    out = set()
    for u, v in t.edges():
        out.add((u, v))
        out.add((v, u))
    return out


def test_k_truss_matches_networkx(spark):
    edges = ba_graph(n=80, m=4, seed=3)
    for k in (3, 4, 5):
        assert _got(spark, edges, k) == _want(edges, k)


def test_k_truss_k2_is_identity(spark):
    edges = er_graph(n=30, p=0.1, seed=2)
    sym = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    assert _got(spark, edges, 2) == sym


def test_k_truss_resume_mid_peel(spark, tmp_path):
    from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import latest_checkpoint

    edges = ba_graph(n=60, m=4, seed=8)
    e = edge_df(spark, edges)
    ckpt = str(tmp_path / "ck")
    want = sorted(map(tuple, k_truss(spark, e, 4, fixed_rounds=4).collect()))

    k_truss_run(spark, e, 4, fixed_rounds=2, checkpoint_dir=ckpt, run_id="t")
    step, state = latest_checkpoint(spark, ckpt, "ktruss", "t")
    assert step == 2
    resumed = k_truss_run(
        spark, e, 4, fixed_rounds=2, checkpoint_dir=ckpt, run_id="t",
        resume_state=state, start_step=step,
    )
    assert sorted(map(tuple, resumed.state.collect())) == want
