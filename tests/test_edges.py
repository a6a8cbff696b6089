import hashlib

from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import (
    degrees,
    densify_vertices,
    derive_edges,
    symmetrize,
    with_content_sha,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.repo_files import (
    expected_import_edges,
    generate_repo_files,
)


def test_generator_deterministic(spark):
    a = generate_repo_files(spark, 5, 4).orderBy("repo", "path").collect()
    b = generate_repo_files(spark, 5, 4).orderBy("repo", "path").collect()
    assert a == b
    assert len(a) == 20
    assert set(r["lang"] for r in a) == {"py"}


def test_sha256_invariant(spark):
    """Engine sha2 must equal python hashlib sha256 per row (input_hint)."""
    rf = with_content_sha(generate_repo_files(spark, 3, 3))
    for row in rf.collect():
        assert row["content_sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_densify_dense_and_deterministic(spark):
    rf = generate_repo_files(spark, 7, 5)
    v1 = densify_vertices(rf, ["repo", "path"])
    ids = sorted(r["vertex"] for r in v1.collect())
    assert ids == list(range(35))
    v2 = {(r["repo"], r["path"]): r["vertex"] for r in densify_vertices(rf, ["repo", "path"]).collect()}
    for r in v1.collect():
        assert v2[(r["repo"], r["path"])] == r["vertex"]


def test_derive_edges_matches_closed_form(spark):
    n_repos, fpr, ipf = 6, 5, 3
    rf = generate_repo_files(spark, n_repos, fpr, imports_per_file=ipf)
    vertices, edges = derive_edges(rf)
    # map dense vertex ids back to file indices via (repo, path)
    key_to_idx = {}
    for r in rf.select("repo", "path").collect():
        rep = int(r["repo"].split("/")[0][3:])
        f = int(r["path"].split("_")[1].split(".")[0])
        key_to_idx[(r["repo"], r["path"])] = rep * fpr + f
    v_to_idx = {
        r["vertex"]: key_to_idx[(r["repo"], r["path"])] for r in vertices.collect()
    }
    got = {(v_to_idx[r["src"]], v_to_idx[r["dst"]]) for r in edges.collect()}
    assert got == expected_import_edges(n_repos, fpr, ipf)


def test_degrees_and_symmetrize(spark):
    rf = generate_repo_files(spark, 4, 4)
    _, edges = derive_edges(rf)
    m = edges.count()
    sym = symmetrize(edges)
    assert sym.count() <= 2 * m
    out_sum = sum(r["degree"] for r in degrees(edges, "out").collect())
    in_sum = sum(r["degree"] for r in degrees(edges, "in").collect())
    assert out_sum == m and in_sum == m


def test_from_import_edges(spark):
    """`from X import name` lines resolve like plain imports; unresolvable
    modules and self-imports are dropped."""
    rows = [
        ("org0/proj0", "src/mod_0.py", "c0", "py",
         "from org0.proj0.mod_1 import fn\nimport org0.proj0.mod_2\n"),
        ("org0/proj0", "src/mod_1.py", "c1", "py",
         "from org9.nowhere import missing\n"),
        ("org0/proj0", "src/mod_2.py", "c2", "py", "import org0.proj0.mod_2\n"),
    ]
    rf = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    vertices, edges = derive_edges(rf)
    vmap = {r["path"]: r["vertex"] for r in vertices.collect()}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {
        (vmap["src/mod_0.py"], vmap["src/mod_1.py"]),
        (vmap["src/mod_0.py"], vmap["src/mod_2.py"]),
    }


def test_degree_assortativity_vs_networkx(spark):
    """Newman assortativity matches NetworkX on ER and BA fixtures (1e-9 —
    the sufficient statistics are exact integers, only the final division
    is float)."""
    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.edges import degree_assortativity
    from tests.oracles import ba_graph, er_graph

    for edges in (er_graph(120, 0.05, seed=7), ba_graph(200, 3, seed=7)):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = degree_assortativity(df).collect()[0]
        g = nx.Graph()
        g.add_edges_from(edges)
        want = nx.degree_assortativity_coefficient(g)
        assert got["n_dir_edges"] == 2 * g.number_of_edges()
        assert abs(got["assortativity"] - want) < 1e-9

    # regular graph: degree variance 0 -> undefined; NULL, not a crash
    ring = [(i, (i + 1) % 10) for i in range(10)]
    got = degree_assortativity(
        spark.createDataFrame(ring, "src long, dst long")
    ).collect()[0]
    assert got["assortativity"] is None


def test_graph_profile_matches_networkx(spark):
    import math

    import networkx as nx

    from parallel_betweenness_centrality_using_bsp_spark.operators.edges import graph_profile
    from tests.oracles import ba_graph

    edges = ba_graph(80, 3, seed=13)
    # make it genuinely directed: drop a few reverses, keep a few
    directed = edges + [(v, u) for u, v in edges[::3]]
    df = spark.createDataFrame(directed, "src long, dst long")
    got = graph_profile(spark, df).collect()[0]

    g = nx.Graph(edges)
    dg = nx.DiGraph(directed)
    n, m = g.number_of_nodes(), g.number_of_edges()
    assert got["n_vertices"] == n
    assert got["n_edges"] == m
    assert got["n_edges_directed"] == dg.number_of_edges()
    assert abs(got["reciprocity"] - nx.reciprocity(dg)) < 1e-6
    assert got["max_degree"] == max(d for _, d in g.degree())
    assert abs(got["avg_degree"] - 2 * m / n) < 1e-6
    assert abs(got["density"] - nx.density(g)) < 1e-6
    assert got["wedges"] == sum(d * (d - 1) // 2 for _, d in g.degree())
    assert got["triangles"] == sum(nx.triangles(g).values()) // 3
    assert abs(got["global_clustering"] - nx.transitivity(g)) < 1e-6
    alpha = 1 + n / sum(math.log(d / 0.5) for _, d in g.degree())
    assert abs(got["alpha_mle"] - alpha) < 1e-6
