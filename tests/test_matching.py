import hashlib

from parallel_betweenness_centrality_using_bsp_spark.operators.matching import greedy_matching
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import ba_graph, er_graph


def _canon(edges):
    return sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})


def _prio(u, v):
    h = hashlib.md5(f"match:{u}:{v}".encode()).hexdigest()
    return f"{h}:{u:012d}:{v:012d}"


def _sequential_greedy(edges):
    """The exact sequential twin: scan canonical edges by ascending md5
    priority, take an edge iff both endpoints are still free."""
    taken, used = set(), set()
    for u, v in sorted(_canon(edges), key=lambda e: _prio(*e)):
        if u not in used and v not in used:
            taken.add((u, v))
            used.update((u, v))
    return taken


def _got(spark, edges, **kw):
    return greedy_matching(spark, edge_df(spark, edges), **kw).collect()


def test_matching_equals_sequential_greedy(spark):
    for edges in (er_graph(n=80, p=0.08, seed=3), ba_graph(n=90, m=3, seed=5)):
        rows = _got(spark, edges)
        got = {(r["src"], r["dst"]) for r in rows}
        assert all(r["round"] >= 1 for r in rows)  # fixpoint: no live rows
        assert got == _sequential_greedy(edges)


def test_matching_is_valid_and_maximal(spark):
    edges = ba_graph(n=120, m=4, seed=11)
    rows = _got(spark, edges)
    pairs = [(r["src"], r["dst"]) for r in rows]
    used = [v for e in pairs for v in e]
    assert len(used) == len(set(used))  # each vertex in at most one pair
    matched = set(used)
    for u, v in _canon(edges):  # maximal: every edge touches a matched vertex
        assert u in matched or v in matched


def test_round_cap_surfaces_live_edges(spark):
    # a long path needs several local-min rounds; capping at 1 must leave
    # explicit round=-1 live rows, never silently truncate
    path = [(i, i + 1) for i in range(40)]
    rows = _got(spark, path, rounds=1)
    r1 = {(r["src"], r["dst"]) for r in rows if r["round"] == 1}
    live = {(r["src"], r["dst"]) for r in rows if r["round"] == -1}
    assert r1 and live
    # live edges are exactly those not touching a round-1 matched vertex
    used = {v for e in r1 for v in e}
    assert live == {(u, v) for u, v in _canon(path) if u not in used and v not in used}


def test_first_round_is_local_minima(spark):
    edges = er_graph(n=50, p=0.1, seed=7)
    rows = _got(spark, edges, rounds=1)
    r1 = {(r["src"], r["dst"]) for r in rows if r["round"] == 1}
    inc = {}
    for u, v in _canon(edges):
        inc.setdefault(u, []).append((u, v))
        inc.setdefault(v, []).append((u, v))
    want = {
        e
        for e in _canon(edges)
        if all(_prio(*e) <= _prio(*f) for x in e for f in inc[x])
    }
    assert r1 == want
