from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.sources.edgelist import (
    read_edgelist,
    write_edgelist,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df


def test_read_edgelist_text(spark, tmp_path):
    p = tmp_path / "graph.txt"
    p.write_text("# a comment\n0 1\n1 2\n% another\n2\t3\n\n3, 4 extra\nx y\n")
    got = read_edgelist(spark, str(p))
    assert sorted((r.src, r.dst) for r in got.collect()) == [
        (0, 1), (1, 2), (2, 3), (3, 4),
    ]


def test_read_edgelist_string_keys(spark, tmp_path):
    p = tmp_path / "named.txt"
    p.write_text("alice bob\nbob carol\n")
    got = read_edgelist(spark, str(p), numeric=False)
    assert sorted((r.src_key, r.dst_key) for r in got.collect()) == [
        ("alice", "bob"), ("bob", "carol"),
    ]


def test_edgelist_roundtrip(spark, tmp_path):
    edges = edge_df(spark, [(0, 1), (5, 9), (7, 3)])
    out = str(tmp_path / "out")
    write_edgelist(edges, out)
    back = read_edgelist(spark, out)
    assert sorted((r.src, r.dst) for r in back.collect()) == sorted(
        (r.src, r.dst) for r in edges.collect()
    )
    assert back.schema.simpleString() == "struct<src:bigint,dst:bigint>"
