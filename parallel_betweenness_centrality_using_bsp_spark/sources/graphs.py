"""Graph fixtures: tiny golden graphs + Spark-native seeded random graphs.

Random generators are pure column expressions over ``spark.range`` — each
edge's endpoints are a deterministic function of (edge index, seed) via
``xxhash64``, so the graph is reproducible regardless of partitioning and the
generator scales to billions of edges without driver involvement (bench uses
it at 1e5–1e6 edges; see BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"


def edge_df(spark: SparkSession, edges: list[tuple[int, int]]) -> DataFrame:
    """Edge DataFrame from python tuples (tests / golden graphs only)."""
    return spark.createDataFrame(edges, EDGE_SCHEMA)


def _u01(col: "F.Column", seed: int, salt: str) -> "F.Column":
    """Deterministic uniform [0,1) from a column value."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(1 << 30))).cast("double") / float(1 << 30)


def random_uniform_graph(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Erdős–Rényi-style multigraph: endpoints uniform over vertices.

    Self-loops removed and duplicates dropped, so the realized edge count is
    slightly under ``n_edges``.
    """
    df = spark.range(0, n_edges, 1, partitions or spark.sparkContext.defaultParallelism)
    src = F.pmod(F.xxhash64("id", F.lit(seed), F.lit("s")), F.lit(n_vertices))
    dst = F.pmod(F.xxhash64("id", F.lit(seed), F.lit("d")), F.lit(n_vertices))
    return (
        df.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def random_power_law_graph(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    gamma: float = 2.0,
    partitions: int | None = None,
) -> DataFrame:
    """Skewed graph: dst drawn from a power-law over vertex ids (hub = id 0).

    Exercises the hub-salting / AQE-skew machinery: dst ids concentrate on
    low ids with Zipf-ish exponent ``gamma``; src stays uniform.
    """
    df = spark.range(0, n_edges, 1, partitions or spark.sparkContext.defaultParallelism)
    src = F.pmod(F.xxhash64("id", F.lit(seed), F.lit("s")), F.lit(n_vertices))
    u = _u01(F.col("id"), seed, "d")
    # Inverse-CDF of a truncated power law on [1, n]: x = n^(u^(1/(gamma-1))) - 1
    dst = (
        F.pow(F.lit(float(n_vertices)), F.pow(u, F.lit(1.0 / (gamma - 1.0)))) - 1.0
    ).cast("long")
    return (
        df.select(src.alias("src"), F.least(dst, F.lit(n_vertices - 1)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


# ---------------------------------------------------------------------------
# Golden graphs (closed-form answers; FIXTURES.md §B3)
# ---------------------------------------------------------------------------

def path_graph_edges(n: int = 5) -> list[tuple[int, int]]:
    return [(i, i + 1) for i in range(n - 1)]


def cycle_graph_edges(n: int = 6) -> list[tuple[int, int]]:
    return [(i, (i + 1) % n) for i in range(n)]


def star_graph_edges(n_leaves: int = 7) -> list[tuple[int, int]]:
    return [(0, i) for i in range(1, n_leaves + 1)]


def complete_graph_edges(n: int = 5) -> list[tuple[int, int]]:
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def two_triangles_edges() -> list[tuple[int, int]]:
    return [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
