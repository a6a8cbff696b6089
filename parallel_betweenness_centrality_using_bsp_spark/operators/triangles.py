"""Triangle counting — degree-ordered edge orientation + 2-path closure.

Classic MapReduce-era formulation (Suri & Vassilvitskii, "Counting Triangles
and the Curse of the Last Reducer", WWW 2011): orient every undirected edge
from the lower-(degree, id) endpoint to the higher one.  The oriented graph
is a DAG where every vertex's out-degree is O(sqrt(m)), which is exactly the
hub-skew defense the north_rule demands — a celebrity vertex's 10^8
undirected neighbors become ~sqrt(m) oriented out-neighbors, so the 2-path
self-join never explodes on hubs.  AQE skew-join splitting stays on as the
second line of defense.

Plan: oriented ⋈ oriented (2-paths, sort-merge or shuffled-hash — big×big)
→ left-semi ⋈ oriented (closure check).  Each triangle {a<b<c in rank order}
is found exactly once as path a→b→c closed by edge a→c.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize


def _oriented(spark: SparkSession, edges: DataFrame, num_partitions: int | None) -> DataFrame:
    p = num_partitions or spark.sparkContext.defaultParallelism
    und = symmetrize(edges)  # both directions present
    deg = und.groupBy(F.col("src").alias("vertex")).agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        und.join(deg.withColumnRenamed("vertex", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("vertex", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    # keep edge u→v iff (deg(u), u) < (deg(v), v): each undirected edge once
    return (
        ranked.where(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
        .repartition(p, "src")
    )


def triangle_triples(
    spark: SparkSession, edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """(a, b, c) rows, one per triangle, in orientation order."""
    o = _oriented(spark, edges, num_partitions).persist()
    o.count()
    paths = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(
            F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
        )
    )
    closed = paths.join(
        o.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return closed


def triangle_count(
    spark: SparkSession, edges: DataFrame, num_partitions: int | None = None
) -> int:
    """Total number of triangles in the undirected graph."""
    return triangle_triples(spark, edges, num_partitions).count()


def triangles_per_vertex(
    spark: SparkSession, edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """(vertex, triangles) — every triangle credited to all 3 corners;
    vertices in no triangle are absent (join with the vertex set and
    coalesce to 0 if a dense result is needed)."""
    t = triangle_triples(spark, edges, num_partitions)
    corners = (
        t.select(F.col("a").alias("vertex"))
        .unionByName(t.select(F.col("b").alias("vertex")))
        .unionByName(t.select(F.col("c").alias("vertex")))
    )
    return corners.groupBy("vertex").agg(F.count(F.lit(1)).alias("triangles"))


def local_clustering_coefficients(
    spark: SparkSession, edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """(vertex, deg, tri, cc) for every vertex with degree ≥ 2:
    cc = 2·tri / (deg·(deg−1)), the local clustering coefficient — rides
    the degree-oriented triangle machinery (hub-safe) plus one degree agg
    and a left join, all on the same vertex partitioning."""
    und = symmetrize(edges)
    deg = und.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tri = triangles_per_vertex(spark, edges, num_partitions)
    return (
        deg.where(F.col("deg") >= 2)
        .join(tri, "vertex", "left")
        .select(
            "vertex",
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("tri"),
            (
                F.lit(2.0)
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1))
            ).alias("cc"),
        )
    )
