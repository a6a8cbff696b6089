import pytest

from parallel_betweenness_centrality_using_bsp_spark.plans.motifs import find


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(set(pairs)), "src long, dst long")


def test_motif_two_path(spark):
    e = _edges(spark, [(1, 2), (2, 3), (2, 4), (5, 1)])
    got = {
        (r["a"], r["b"], r["c"])
        for r in find(e, "(a)-[]->(b); (b)-[]->(c)").collect()
    }
    want = {
        (a, b, c)
        for (a, b) in [(1, 2), (2, 3), (2, 4), (5, 1)]
        for (b2, c) in [(1, 2), (2, 3), (2, 4), (5, 1)]
        if b == b2
    }
    assert got == want


def test_motif_open_triangle_negation(spark):
    # (1,2),(2,3),(1,3): closed. (1,2),(2,4): open (no (1,4))
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (2, 4)])
    got = {
        (r["a"], r["b"], r["c"])
        for r in find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)").collect()
    }
    assert (1, 2, 3) not in got  # closed by (1,3)
    assert (1, 2, 4) in got
    assert (2, 3, 3) not in got  # no (3,3) edge to chain


def test_motif_anonymous_and_mutual(spark):
    e = _edges(spark, [(1, 2), (2, 1), (3, 1), (4, 3)])
    # vertices with a mutual edge
    got = {(r["a"], r["b"]) for r in find(e, "(a)-[]->(b); (b)-[]->(a)").collect()}
    assert got == {(1, 2), (2, 1)}
    # vertices with any in-neighbor (anonymous source), deduped by select?
    rows = find(e, "()-[]->(a)").collect()
    assert {r["a"] for r in rows} == {1, 2, 3}
    assert len(rows) == 4  # one row per binding, incl. both in-edges of 1


def test_motif_errors(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="bad motif term"):
        find(e, "(a)->(b)")
    with pytest.raises(ValueError, match="unbound vertex"):
        find(e, "(a)-[]->(b); !(a)-[]->(z)")
    with pytest.raises(ValueError, match="positive term"):
        find(e, "!(a)-[]->(b)")
    with pytest.raises(ValueError, match="named edges"):
        find(e, "(a)-[e]->(b)")
    with pytest.raises(ValueError, match="anonymous"):
        find(e, "(a)-[]->(b); !()-[]->(b)")


def test_motif_matches_triangle_kernel(spark):
    # directed-triangle motif count == 3! x undirected triangle count on a
    # symmetric digraph wouldn't hold; instead check against a hand join
    from tests.oracles import er_graph

    pairs = er_graph(n=40, p=0.1, seed=41)
    e = _edges(spark, pairs)
    got = find(e, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").count()
    es = set(pairs)
    want = sum(
        1
        for (a, b) in es
        for c in {d for (s, d) in es if s == b}
        if (c, a) in es
    )
    assert got == want


def test_motif_self_loop_term(spark):
    """'(a)-[]->(a)' binds self-loops as ONE column, not duplicate names."""
    e = _edges(spark, [(1, 1), (2, 3), (4, 4), (4, 5)])
    got = find(e, "(a)-[]->(a)")
    assert got.columns == ["a"]
    assert sorted(r["a"] for r in got.collect()) == [1, 4]
    # self-loop vertex joined with an outgoing edge
    got2 = find(e, "(a)-[]->(a); (a)-[]->(b)")
    assert sorted((r["a"], r["b"]) for r in got2.collect()) == [(1, 1), (4, 4), (4, 5)]
    # negated self-loop: bindings whose vertex has NO self-loop
    got3 = find(e, "(a)-[]->(b); !(a)-[]->(a)")
    assert sorted((r["a"], r["b"]) for r in got3.collect()) == [(2, 3)]
