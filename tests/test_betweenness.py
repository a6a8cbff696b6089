import numpy as np

from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import (
    betweenness_bsp,
    betweenness_csr,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import (
    cycle_graph_edges,
    edge_df,
    path_graph_edges,
    star_graph_edges,
)

from tests.oracles import (
    assert_scores_close,
    ba_graph,
    df_to_dict,
    er_graph,
    oracle_betweenness,
    oracle_brandes_state,
)


def test_path_graph_closed_form(spark):
    # P5: bc = [0, 3, 4, 3, 0]
    res = betweenness_bsp(spark, edge_df(spark, path_graph_edges(5)))
    got = df_to_dict(res.bc, "vertex", "bc")
    assert_scores_close(got, {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0})


def test_star_graph(spark):
    # S8 center: (8 choose 2) pairs routed through center = 21
    res = betweenness_bsp(spark, edge_df(spark, star_graph_edges(7)))
    got = df_to_dict(res.bc, "vertex", "bc")
    want = oracle_betweenness(star_graph_edges(7))
    assert_scores_close(got, want)


def test_cycle_graph_both_impls(spark):
    edges = cycle_graph_edges(6)
    want = oracle_betweenness(edges)
    got_bsp = df_to_dict(betweenness_bsp(spark, edge_df(spark, edges)).bc, "vertex", "bc")
    got_csr = df_to_dict(betweenness_csr(spark, edge_df(spark, edges)).bc, "vertex", "bc")
    assert_scores_close(got_bsp, want)
    assert_scores_close(got_csr, want)


def test_er_graph_bsp(spark):
    edges = er_graph(n=60, p=0.08, seed=42)
    want = oracle_betweenness(edges)
    res = betweenness_bsp(spark, edge_df(spark, edges), batch_size=64)
    assert_scores_close(df_to_dict(res.bc, "vertex", "bc"), want)
    assert res.supersteps > 0 and res.edges_traversed > 0


def test_er_graph_csr(spark):
    edges = er_graph(n=200, p=0.04, seed=42)
    want = oracle_betweenness(edges)
    res = betweenness_csr(spark, edge_df(spark, edges))
    assert_scores_close(df_to_dict(res.bc, "vertex", "bc"), want)


def test_ba_skewed_csr(spark):
    edges = ba_graph(n=300, m=3, seed=42)
    want = oracle_betweenness(edges)
    res = betweenness_csr(spark, edge_df(spark, edges))
    assert_scores_close(df_to_dict(res.bc, "vertex", "bc"), want)


def test_directed_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    want = oracle_betweenness(edges, directed=True)
    res = betweenness_bsp(spark, edge_df(spark, edges), directed=True)
    assert_scores_close(df_to_dict(res.bc, "vertex", "bc"), want)


def test_state_arrays_match_sequential_brandes(spark):
    """dist/sigma/delta must match the sequential Brandes oracle (1e-6)."""
    edges = er_graph(n=40, p=0.1, seed=5)
    source = 0
    res = betweenness_bsp(
        spark, edge_df(spark, edges), sources=[source], return_state=True
    )
    state = {
        r["vertex"]: (r["dist"], r["sigma"], r["delta"])
        for r in res.state.where("source = 0").collect()
    }
    dist, sigma, delta = oracle_brandes_state(edges, source)
    assert {v: d for v, (d, _, _) in state.items()} == dist
    for v in dist:
        assert np.isclose(state[v][1], sigma[v], atol=1e-6)
        assert np.isclose(state[v][2], delta[v], atol=1e-6)


def test_csr_default_sources_stay_distributed(spark):
    """prepare_csr's default source set must be a DataFrame (spark.range),
    never an O(n) Python list on the driver, and the sweep must accept a
    sources DataFrame producing the same scores as the list form."""
    from pyspark.sql import DataFrame

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness import (
        betweenness_csr_sweep,
        prepare_csr,
    )

    edges = er_graph(n=80, p=0.06, seed=3)
    art, default_sources = prepare_csr(spark, edge_df(spark, edges))
    try:
        assert isinstance(default_sources, DataFrame)
        assert default_sources.count() == art.n
        sample = [0, 7, 21]
        via_df = betweenness_csr_sweep(
            spark,
            art,
            spark.createDataFrame([(s,) for s in sample], "source long"),
        )
        via_list = betweenness_csr_sweep(spark, art, sample)
        assert via_df.supersteps == via_list.supersteps == len(sample)
        assert_scores_close(
            df_to_dict(via_df.bc, "vertex", "bc"),
            df_to_dict(via_list.bc, "vertex", "bc"),
        )
    finally:
        art.cleanup()


def test_source_sampling_partial_sums_agree(spark):
    edges = er_graph(n=80, p=0.06, seed=9)
    sources = [0, 5, 17, 33]
    a = df_to_dict(betweenness_bsp(spark, edge_df(spark, edges), sources=sources).bc, "vertex", "bc")
    b = df_to_dict(betweenness_csr(spark, edge_df(spark, edges), sources=sources).bc, "vertex", "bc")
    assert_scores_close(a, b)


def test_estimator_scaling(spark):
    """Brandes-Pich estimate with the FULL source set equals exact bc, and a
    half sample scales partial sums by exactly n/|S|."""
    edges = er_graph(n=50, p=0.1, seed=8)
    want = oracle_betweenness(edges)
    full = betweenness_csr(spark, edge_df(spark, edges), estimate=True)
    assert_scores_close(df_to_dict(full.bc, "vertex", "bc"), want)
    full_bsp = betweenness_bsp(spark, edge_df(spark, edges), estimate=True)
    assert_scores_close(df_to_dict(full_bsp.bc, "vertex", "bc"), want)
    sample = [0, 10, 20, 30, 40]
    est = betweenness_csr(spark, edge_df(spark, edges), sources=sample, estimate=True)
    raw = betweenness_csr(spark, edge_df(spark, edges), sources=sample)
    e_d, r_d = df_to_dict(est.bc, "vertex", "bc"), df_to_dict(raw.bc, "vertex", "bc")
    # the dense-id contract counts n as max_id + 1 (isolated ids included)
    n = max(v for e in edges for v in e) + 1
    for v in e_d:
        assert abs(e_d[v] - r_d[v] * n / len(sample)) < 1e-9


def test_weighted_betweenness_matches_networkx(spark):
    """Dijkstra-Brandes: weighted scores vs networkx at 1e-6, undirected
    and directed, on a weighted graph whose shortest paths genuinely differ
    from the BFS ones (heavy direct edges bypassed by light 2-hop paths)."""
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
    )

    rng_edges = er_graph(n=40, p=0.12, seed=21)
    wedges = [(u, v, 1 + ((u * 7 + v * 13) % 5)) for u, v in rng_edges]
    for directed in (False, True):
        g = nx.DiGraph() if directed else nx.Graph()
        g.add_weighted_edges_from(wedges)
        want = nx.betweenness_centrality(g, normalized=False, weight="weight")
        df = spark.createDataFrame(wedges, "src long, dst long, w long")
        got = df_to_dict(
            betweenness_weighted(spark, df, directed=directed).bc, "vertex", "bc"
        )
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-6, (directed, v, got[v], want[v])


def test_weighted_betweenness_unit_weights_match_bfs_brandes(spark):
    edges = er_graph(n=35, p=0.12, seed=4)
    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
    )

    df = spark.createDataFrame(
        [(u, v, 1) for u, v in edges], "src long, dst long, w long"
    )
    got = df_to_dict(betweenness_weighted(spark, df).bc, "vertex", "bc")
    want = oracle_betweenness(edges)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_weighted_betweenness_rejects_nonpositive_weights(spark):
    import pytest

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
    )

    df = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="strictly positive"):
        betweenness_weighted(spark, df)


def test_weighted_estimator_scaling(spark):
    """estimate=True with the FULL source set equals the exact run (factor
    n/n = 1), and with half the sources equals exactly (n/|S|) x the
    half-sample partial sums — the Brandes-Pich factor, same contract as
    the unweighted flag."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
    )
    from tests.oracles import er_graph

    edges = [(u, v) for u, v in er_graph(40, 0.12, seed=9)]
    we = spark.createDataFrame(
        [(u, v, (u + v) % 3 + 1) for u, v in edges], "src long, dst long, w long"
    )
    nodes = sorted({x for uv in edges for x in uv})
    exact = {
        r["vertex"]: r["bc"]
        for r in betweenness_weighted(spark, we, sources=nodes).bc.collect()
    }
    est_full = {
        r["vertex"]: r["bc"]
        for r in betweenness_weighted(
            spark, we, sources=nodes, estimate=True
        ).bc.collect()
    }
    assert all(abs(est_full[v] - exact[v]) < 1e-9 for v in exact)

    half = nodes[: len(nodes) // 2]
    plain = {
        r["vertex"]: r["bc"]
        for r in betweenness_weighted(spark, we, sources=half).bc.collect()
    }
    est = {
        r["vertex"]: r["bc"]
        for r in betweenness_weighted(
            spark, we, sources=half, estimate=True
        ).bc.collect()
    }
    f = len(nodes) / len(half)
    assert all(abs(est[v] - plain[v] * f) < 1e-9 for v in exact)


def test_weighted_betweenness_rejects_fractional_weights(spark):
    """A weight in (0,1) truncates to 0 under the long cast — must be
    rejected loudly, not silently corrupt sigma/delta (ADVICE r4)."""
    import pytest

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
    )

    df = spark.createDataFrame([(0, 1, 0.5)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="INTEGRAL"):
        betweenness_weighted(spark, df)
    df2 = spark.createDataFrame([(0, 1, 1.5)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="INTEGRAL"):
        betweenness_weighted(spark, df2)


def test_weighted_csr_sweep_matches_networkx(spark):
    """The Dial's-level Dijkstra-Brandes numpy kernel (weighted CSR fast
    path) vs networkx at 1e-6, undirected and directed."""
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted_csr_sweep,
        prepare_csr_weighted,
    )

    rng_edges = er_graph(n=40, p=0.12, seed=21)
    wedges = [(u, v, 1 + ((u * 7 + v * 13) % 5)) for u, v in rng_edges]
    for directed in (False, True):
        g = nx.DiGraph() if directed else nx.Graph()
        g.add_weighted_edges_from(wedges)
        want = nx.betweenness_centrality(g, normalized=False, weight="weight")
        df = spark.createDataFrame(wedges, "src long, dst long, w long")
        art, src = prepare_csr_weighted(spark, df, directed=directed)
        try:
            got = df_to_dict(
                betweenness_weighted_csr_sweep(
                    spark, art, src, directed=directed
                ).bc,
                "vertex",
                "bc",
            )
        finally:
            art.cleanup()
        for v in want:
            assert abs(got[v] - want[v]) < 1e-6, (directed, v, got[v], want[v])
        # ids absent from the edge list (dense-id padding) carry zero
        for v in set(got) - set(want):
            assert got[v] == 0.0


def test_weighted_csr_sweep_ba_matches_join_formulation(spark):
    """Fast path == join-formulation Dijkstra-Brandes on a skewed graph
    with wide weights — the two implementations share no code."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        betweenness_weighted,
        betweenness_weighted_csr_sweep,
        prepare_csr_weighted,
    )

    edges = ba_graph(n=60, m=2, seed=13)
    wedges = [(u, v, 1 + ((u * 11 + v * 3) % 9)) for u, v in edges]
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    sources = [0, 5, 9]
    join_res = betweenness_weighted(spark, df, sources=sources, max_hops=120)
    a = df_to_dict(join_res.bc, "vertex", "bc")
    art, _ = prepare_csr_weighted(spark, df)
    try:
        b = df_to_dict(
            betweenness_weighted_csr_sweep(spark, art, sources).bc, "vertex", "bc"
        )
    finally:
        art.cleanup()
    for v in b:
        assert abs(a.get(v, 0.0) - b[v]) < 1e-6, v


def test_weighted_csr_rejects_bad_weights(spark):
    import pytest

    from parallel_betweenness_centrality_using_bsp_spark.operators.betweenness_weighted import (
        prepare_csr_weighted,
    )

    for bad_w in (0.0, -2.0, 0.5):
        df = spark.createDataFrame(
            [(0, 1, bad_w), (1, 2, 1.0)], "src long, dst long, w double"
        )
        with pytest.raises(Exception):
            prepare_csr_weighted(spark, df)
