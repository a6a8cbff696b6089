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


def test_k_truss_prepeel_hub_graph_matches_networkx(spark):
    """Hub-heavy graph: one vertex with thousands of pendant edges plus an
    embedded K6.  The default (k-1)-core pre-peel must (a) leave the truss
    fixpoint identical to networkx, (b) collapse the hub's O(d^2) wedge
    fan-out before the wedge join ever runs."""
    from pyspark.sql import functions as F

    from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize
    from parallel_betweenness_centrality_using_bsp_spark.operators.kcore import k_core_run

    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pendants = [(0, v) for v in range(10, 3010)]
    edges = clique + pendants
    e = edge_df(spark, edges)

    assert _got(spark, edges, 4) == _want(edges, 4)
    # pre-peel ON (default) and OFF agree at the fixpoint
    got_off = sorted(map(tuple, k_truss(spark, e, 4, pre_peel=False).collect()))
    assert sorted(map(tuple, k_truss(spark, e, 4).collect())) == got_off

    # wedge rows of the first peel round = sum over vertices of deg^2
    def wedge_rows(sym_edges):
        return (
            sym_edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * F.col("d"))).first()[0]
        )

    raw = wedge_rows(symmetrize(e))
    peeled = wedge_rows(k_core_run(spark, e, 3).state)
    # the 3000-degree hub dominates raw (~9e6 rows); the peeled graph is K6
    assert raw > 9_000_000
    assert peeled < raw * 0.01
