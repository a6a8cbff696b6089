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


def incremental_triangles(
    spark: SparkSession,
    base_edges: DataFrame,
    delta_edges: DataFrame,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """1-row (new_triangles long): triangles created by adding ``delta_edges``
    to ``base_edges`` — WITHOUT rescanning the base wedge space.

    Every new triangle contains ≥1 delta edge, so inclusion–exclusion over
    how many of its 3 edges are delta gives

        new = S1 − S2 + S3
        S1 = Σ over delta edges (u,v) of |N_A(u) ∩ N_A(v)|   (= T1+2T2+3T3)
        S2 = # delta-edge pairs sharing a vertex, closed by any A edge
                                                              (= T2+3T3)
        S3 = # triangles entirely inside the delta            (= T3)

    where A = base ∪ delta (undirected, deduplicated) and Ti = new triangles
    with exactly i delta edges.  Work is delta-sized: S1 expands each delta
    edge from its LOWER-degree endpoint (per-edge cost min(deg u, deg v),
    the same last-reducer defense as the cold kernel's orientation), S2 is
    a |delta|² self-join bounded by the delta's own degree distribution,
    S3 runs the cold oriented kernel on the delta alone.  The base wedge
    space — the O(m·sqrt(m)) term a cold recount pays — is never touched.

    Every use of A here (wedge expansion from x, closure edges (y,w) and
    (pa,pb), expansion-side degrees) only ever reads rows whose src is a
    DELTA ENDPOINT, so the base is reduced up front by ONE broadcast
    semi-join against the endpoint set and deduplicated AFTER that filter:
    the base is scanned once and never shuffled at its own size — every
    shuffle in the plan is delta-adjacency-sized.  (The broadcast is the
    endpoint set, ≤ 2·|delta| ids; a delta so large it can't broadcast is
    past the point where a cold recount is the better plan anyway.)

    Delta edges already present in the base are dropped (they create
    nothing), so callers may pass an overlapping delta safely.  Total count
    after the delta = cold count of the base + this row."""
    p = num_partitions or spark.sparkContext.defaultParallelism
    dboth = symmetrize(delta_edges)
    eps = dboth.select("src").distinct()
    b = base_edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    # persisted: base_e is read twice (directly in `a` and inside delta's
    # anti-join) — without the persist the base parquet is scanned twice
    base_e = (
        b.unionByName(b.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .join(F.broadcast(eps), "src", "left_semi")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    delta = (
        dboth.join(base_e, ["src", "dst"], "left_anti")
        .repartition(p, "src")
        .persist()
    )
    a = base_e.unionByName(delta).repartition(p, "src").persist()
    a.count()

    # S1 — expand from the lower-(degree, id) endpoint of each delta edge;
    # `a` holds every A-row with src in the endpoint set, so endpoint
    # degrees computed from it are the full-graph degrees
    deg = a.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    cd = (
        delta.where(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    low_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    xy = cd.select(
        F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("x"),
        F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("y"),
    )
    # alias: xy's lineage includes delta, which is also a branch of `a`
    wedges = (
        xy.alias("xy")
        .join(a.alias("aw"), F.col("xy.x") == F.col("aw.src"))
        .select(
            F.col("xy.x").alias("x"),
            F.col("xy.y").alias("y"),
            F.col("aw.dst").alias("w"),
        )
    )
    s1 = wedges.join(
        a.select(F.col("src").alias("y"), F.col("dst").alias("w")),
        ["y", "w"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("s1"))

    # S2 — unordered pairs of delta edges sharing a vertex, closed in A
    d1, d2 = delta.alias("d1"), delta.alias("d2")
    pairs = (
        d1.join(d2, F.col("d1.src") == F.col("d2.src"))
        .where(F.col("d1.dst") < F.col("d2.dst"))
        .select(F.col("d1.dst").alias("pa"), F.col("d2.dst").alias("pb"))
    )
    s2 = pairs.join(
        a.select(F.col("src").alias("pa"), F.col("dst").alias("pb")),
        ["pa", "pb"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("s2"))

    # S3 — triangles entirely inside the (small) delta
    s3 = triangle_triples(spark, delta, num_partitions).agg(
        F.count(F.lit(1)).alias("s3")
    )

    out = (
        s1.crossJoin(s2)
        .crossJoin(s3)
        .select(
            (F.col("s1") - F.col("s2") + F.col("s3")).alias("new_triangles")
        )
    )
    if not materialize:
        # caller owns the lifecycle of the three persisted relations (base
        # slice, delta, merged adjacency) — used by plan-shape tests that
        # need the join tree inspectable before any checkpoint erases it
        return out
    # eager: the result is one row, and materializing it here lets the three
    # persisted relations be released instead of leaking across calls in a
    # long-lived session (the streaming maintenance loop)
    out = out.localCheckpoint(eager=True)
    a.unpersist()
    delta.unpersist()
    base_e.unpersist()
    return out


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
