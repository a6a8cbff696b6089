"""Hypothesis property tests (SURVEY.md §5.3): structural invariants that
must hold for ARBITRARY small graphs, not just the seeded fixtures.

Example counts are small (Spark actions cost ~100ms each); the seeded
oracle tests carry the statistical weight, these carry the edge cases
(self-contained stars, parallel edges, singleton components, empty-ish
graphs) that random seeds rarely produce.
"""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.components import connected_components
from parallel_betweenness_centrality_using_bsp_spark.operators.pagerank import pagerank
from parallel_betweenness_centrality_using_bsp_spark.operators.triangles import triangle_count
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import df_to_dict, oracle_components, oracle_triangle_count

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_lists)
@SLOW
def test_components_match_oracle_exactly(spark, edges):
    got = df_to_dict(connected_components(spark, edge_df(spark, edges)).state, "vertex", "label")
    assert got == oracle_components(edges)


@given(edges=edge_lists)
@SLOW
def test_triangle_count_matches_oracle(spark, edges):
    assert triangle_count(spark, edge_df(spark, edges)) == oracle_triangle_count(edges)


@given(edges=edge_lists)
@SLOW
def test_star_contraction_matches_hashmin(spark, edges):
    a = df_to_dict(
        connected_components(spark, edge_df(spark, edges), algorithm="starcontract").state,
        "vertex", "label",
    )
    assert a == oracle_components(edges)


@given(edges=edge_lists)
@SLOW
def test_betweenness_matches_oracle(spark, edges):
    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import betweenness_csr

    from tests.oracles import assert_scores_close, oracle_betweenness

    got = df_to_dict(betweenness_csr(spark, edge_df(spark, edges)).bc, "vertex", "bc")
    assert_scores_close(got, oracle_betweenness(edges))


@given(edges=edge_lists)
@SLOW
def test_pagerank_mass_conserved(spark, edges):
    run = pagerank(spark, edge_df(spark, edges), tol=0.0, max_supersteps=3)
    total = run.state.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    assert run.state.where(F.col("pr") <= 0).count() == 0


@given(edges=edge_lists)
@SLOW
def test_scc_matches_networkx_exactly(spark, edges):
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.scc import (
        strongly_connected_components,
    )

    got = df_to_dict(
        strongly_connected_components(spark, edge_df(spark, edges)), "vertex", "scc"
    )
    g = nx.DiGraph(edges)
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    assert got == want
