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


def test_star_contraction_matches_oracle(spark):
    edges = er_graph(n=200, p=0.015, seed=3)  # sparse → several components
    run = connected_components(spark, edge_df(spark, edges), algorithm="starcontract")
    assert run.converged
    assert df_to_dict(run.state, "vertex", "label") == oracle_components(edges)


def test_star_contraction_logarithmic_rounds_on_chain(spark):
    """A path graph is hash-min's worst case (rounds = diameter); star
    contraction must finish in O(log n) rounds and still be exact."""
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import path_graph_edges

    edges = path_graph_edges(60)
    star = connected_components(spark, edge_df(spark, edges), algorithm="starcontract")
    assert df_to_dict(star.state, "vertex", "label") == oracle_components(edges)
    assert star.supersteps <= 10, f"star contraction took {star.supersteps} rounds on P60"


def test_starcontract_rejects_resume(spark):
    import pytest
    from parallel_betweenness_centrality_using_bsp_spark.operators.components import connected_components
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

    e = edge_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="starcontract"):
        connected_components(spark, e, algorithm="starcontract", start_step=3)


def test_k_core_matches_networkx(spark):
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.kcore import k_core
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

    from tests.oracles import ba_graph

    edges = ba_graph(n=150, m=3, seed=7)
    got = {r["vertex"]: r["deg"] for r in k_core(spark, edge_df(spark, edges), k=4).collect()}
    g = nx.Graph()
    g.add_edges_from(edges)
    core = nx.k_core(g, 4)
    assert set(got) == set(core.nodes())
    assert got == dict(core.degree())


def test_k_core_resume_mid_peel(spark, tmp_path):
    from parallel_betweenness_centrality_using_bsp_spark.operators.kcore import k_core, k_core_run
    from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import latest_checkpoint
    from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

    from tests.oracles import ba_graph

    edges = ba_graph(n=120, m=3, seed=5)
    e = edge_df(spark, edges)
    ckpt = str(tmp_path / "ck")

    want = sorted(
        map(tuple, k_core(spark, e, k=4, fixed_rounds=5).collect())
    )

    # crash after 2 peel rounds, then resume the remaining 3
    k_core_run(spark, e, k=4, fixed_rounds=2, checkpoint_dir=ckpt, run_id="kc")
    step, state = latest_checkpoint(spark, ckpt, "kcore", "kc")
    assert step == 2
    resumed = k_core_run(
        spark, e, k=4, fixed_rounds=3, checkpoint_dir=ckpt, run_id="kc",
        resume_state=state, start_step=step,
    )
    from pyspark.sql import functions as F

    got = sorted(
        map(
            tuple,
            resumed.state.groupBy(F.col("src").alias("vertex"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .collect(),
        )
    )
    assert got == want


def test_incremental_components_matches_cold_run(spark):
    """Adding a delta to existing labels gives EXACTLY the cold-run labels:
    merges across components, edges internal to a component, brand-new
    vertices (including one bridging old and new), several seeds."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.components import (
        incremental_components,
    )

    for seed in (3, 11):
        base = er_graph(n=60, p=0.02, seed=seed)          # sparse: many comps
        extra = er_graph(n=60, p=0.01, seed=seed + 100)
        delta = [e for e in extra if e not in set(base)]
        # new vertices: an isolated new pair and a bridge into the old graph
        delta += [(200, 201), (202, 5), (7, 7)]
        cold = df_to_dict(
            connected_components(spark, edge_df(spark, base + delta)).state,
            "vertex", "label",
        )
        warm_labels = connected_components(spark, edge_df(spark, base)).state
        warm = df_to_dict(
            incremental_components(spark, warm_labels, edge_df(spark, delta)),
            "vertex", "label",
        )
        assert warm == cold, f"seed={seed}"


def test_incremental_components_empty_and_internal_delta(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.components import (
        incremental_components,
    )

    base = two_triangles_edges()
    labels = connected_components(spark, edge_df(spark, base)).state
    # delta entirely inside one existing component: labels unchanged
    internal = edge_df(spark, [(0, 2)])
    got = df_to_dict(
        incremental_components(spark, labels, internal), "vertex", "label"
    )
    assert got == df_to_dict(labels, "vertex", "label")
