"""Deterministic random walks — DeepWalk/node2vec-style corpus generation
for embedding training, as iterative DataFrame joins.

True RNG walks are irreproducible across retries and engines; here step k
of the walk starting at s picks neighbor index ``md5int(s ':' k) mod
degree(v)`` — a fixed hash family (the portable 60-bit md5 value also used
by the SimHash oracle family), so walks are (a) deterministic under task
retries, (b) reproducible bit-for-bit by the DuckDB oracle
(``graph_random_walks``), and (c) still uniform-ish over neighbors.

Plan shape per step: state ⋈ degrees (pick the index) then ⋈ the indexed
adjacency on (vertex, idx) — two hash joins per step against tables that
are partitioned by vertex ONCE and persisted; the walk state (one row per
walk) is the only thing that moves.  Walks at a vertex with no out-edges
stop (the step join drops them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.hashing import md5_token_value
from parallel_betweenness_centrality_using_bsp_spark.operators.edges import symmetrize


def indexed_adjacency(edges: DataFrame, directed: bool = False) -> tuple[DataFrame, DataFrame]:
    """(adj, deg): adjacency with a dense per-source neighbor index
    (ordered by dst — deterministic) and out-degrees."""
    e = (
        edges.select("src", "dst").dropDuplicates(["src", "dst"])
        if directed
        else symmetrize(edges)
    )
    w = Window.partitionBy("src").orderBy("dst")
    adj = e.withColumn("idx", F.row_number().over(w) - 1)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return adj, deg


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    starts: DataFrame,
    *,
    walk_length: int = 4,
    directed: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """(walk_id, pos, vertex) rows for walks of ``walk_length`` steps from
    each start vertex (walk_id = start vertex; pos 0 is the start).

    ``starts`` is a DataFrame(vertex long) — the start set stays
    distributed; nothing is collected.
    """
    p = num_partitions or spark.sparkContext.defaultParallelism
    adj, deg = indexed_adjacency(edges, directed)
    adj = adj.repartition(p, "src").persist()
    deg = deg.repartition(p, "src").persist()

    state = starts.select(
        F.col("vertex").alias("walk_id"), F.col("vertex").alias("v")
    )
    out = state.select("walk_id", F.lit(0).alias("pos"), F.col("v").alias("vertex"))
    for k in range(1, walk_length + 1):
        choice = md5_token_value(
            F.concat_ws(":", F.col("walk_id").cast("string"), F.lit(str(k)))
        )
        # fresh aliases per step: the lineage joins adj/deg repeatedly and
        # Spark's self-join ambiguity check needs qualified references
        a, d = adj.alias(f"_a{k}"), deg.alias(f"_d{k}")
        state = (
            state.join(d, state.v == F.col(f"_d{k}.src"))
            .select("walk_id", "v", (choice % F.col(f"_d{k}.deg")).alias("_choice"))
            .join(
                a,
                (F.col("v") == F.col(f"_a{k}.src"))
                & (F.col("_choice") == F.col(f"_a{k}.idx")),
            )
            .select("walk_id", F.col(f"_a{k}.dst").alias("v"))
            # materialize each step: without this the final union's arm k
            # nests all k prior joins — O(len²) plan growth and re-executed
            # walk prefixes at DeepWalk-typical lengths (40+)
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            state.select("walk_id", F.lit(k).alias("pos"), F.col("v").alias("vertex"))
        )
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out
