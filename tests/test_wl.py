import hashlib

import networkx as nx

from parallel_betweenness_centrality_using_bsp_spark.operators.wl import wl_refinement
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import ba_graph, er_graph


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_wl(edges, rounds):
    """Exact sequential twin of the commutative-hash WL iteration."""
    g = nx.Graph(edges)
    c = {v: g.degree(v) for v in g.nodes()}
    for _ in range(rounds):
        nxt = {}
        for v in g.nodes():
            counts = {}
            for u in g.neighbors(v):
                counts[c[u]] = counts.get(c[u], 0) + 1
            total = sum(_md5_60(f"{cu}#{k}") for cu, k in counts.items())
            nxt[v] = _md5_60(f"{c[v]}|{total}")
        c = nxt
    return c


def _got(spark, edges, rounds):
    return {
        r["vertex"]: r["color"]
        for r in wl_refinement(spark, edge_df(spark, edges), rounds).collect()
    }


def _partition(colors):
    classes = {}
    for v, c in colors.items():
        classes.setdefault(c, set()).add(v)
    return {frozenset(s) for s in classes.values()}


def test_wl_matches_python_recomputation(spark):
    edges = er_graph(n=60, p=0.08, seed=17)
    for rounds in (1, 3):
        assert _got(spark, edges, rounds) == _python_wl(edges, rounds)


def test_wl_partition_matches_networkx(spark):
    # partitions are hash-scheme independent (modulo ~2^-60 collisions):
    # compare color classes against networkx's WL subgraph hashes
    edges = ba_graph(n=70, m=3, seed=19)
    g = nx.Graph(edges)
    # networkx ≥ 3.5 returns the INITIAL (degree) label's hash as element
    # 0, so its element r corresponds to our round r
    nxh = nx.weisfeiler_lehman_subgraph_hashes(g, iterations=4)
    for rounds in (1, 2, 3):
        want = {}
        for v, hs in nxh.items():
            want.setdefault(hs[rounds], set()).add(v)
        assert _partition(_got(spark, edges, rounds)) == {
            frozenset(s) for s in want.values()
        }


def test_wl_refines(spark):
    # color classes at round t+1 are a refinement of round t's
    edges = er_graph(n=80, p=0.06, seed=23)
    prev = _partition(_got(spark, edges, 1))
    for rounds in (2, 3):
        cur = _partition(_got(spark, edges, rounds))
        for cls in cur:
            assert any(cls <= big for big in prev)
        prev = cur


def test_wl_uniform_on_vertex_transitive(spark):
    # a cycle is vertex-transitive: every round must keep ONE color class
    n = 24
    cycle = [(i, (i + 1) % n) for i in range(n)]
    assert len(set(_got(spark, cycle, 3).values())) == 1


def test_wl_separates_roles_on_star_of_paths(spark):
    # hub — mid — leaf on a spider graph: three structural roles, three
    # colors from round 2 onward
    edges = []
    for a in range(5):
        edges += [(0, 1 + 2 * a), (1 + 2 * a, 2 + 2 * a)]
    got = _got(spark, edges, 2)
    hub = got[0]
    mids = {got[1 + 2 * a] for a in range(5)}
    leaves = {got[2 + 2 * a] for a in range(5)}
    assert len(mids) == 1 and len(leaves) == 1
    assert len({hub, *mids, *leaves}) == 3
