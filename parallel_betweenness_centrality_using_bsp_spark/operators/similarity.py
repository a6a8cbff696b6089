"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k against a query vector: one
  JVM-side higher-order-function scan + TakeOrderedAndProject.  The
  always-correct baseline and the per-bucket verifier.
* ``hyperplane_buckets`` / ``ann_topk`` — random-hyperplane LSH (Charikar
  2002): a seeded numpy hyperplane matrix is broadcast, sign bits are
  computed in one Arrow-batched pandas UDF (matrix multiply per batch), and
  search probes only buckets within ``probe_hamming`` of the query's bucket
  — at 100 TB the scan touches ~1/2^bits of the data instead of all of it.
* ``embedding_neardup_pairs`` — near-duplicate vector pairs via shared
  bucket + exact cosine ≥ threshold, the embedding leg of the dedup suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from parallel_betweenness_centrality_using_bsp_spark.functions.vectors import cosine


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cos) of the k nearest vectors by cosine — exact."""
    q = F.lit(query_vec).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits)).astype(np.float64)


def hyperplane_buckets(
    spark: SparkSession,
    df: DataFrame,
    *,
    dim: int,
    bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Input + ``bucket`` int column: sign-bit LSH code of each vector."""
    planes = spark.sparkContext.broadcast(_hyperplanes(dim, bits, seed))

    @pandas_udf("long")
    def code(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ planes.value) > 0  # (batch, bits)
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return pd.Series(signs @ weights)

    return df.withColumn("bucket", code(F.col(vec_col)))


def bucket_of(query_vec: list[float], *, bits: int = 12, seed: int = 42) -> int:
    q = np.asarray(query_vec, dtype=np.float64)
    signs = (q @ _hyperplanes(len(query_vec), bits, seed)) > 0
    return int(signs @ (1 << np.arange(bits)))


def ann_topk(
    spark: SparkSession,
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    bits: int = 12,
    probe_hamming: int = 1,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan only buckets within probe_hamming of the
    query's bucket, exact cosine inside.  Recall grows with probe_hamming;
    probe_hamming = bits degrades to brute force."""
    dim = len(query_vec)
    bucketed = hyperplane_buckets(spark, df, dim=dim, bits=bits, seed=seed, vec_col=vec_col)
    qb = bucket_of(query_vec, bits=bits, seed=seed)
    probes = [qb]
    if probe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(bits)]
    if probe_hamming >= 2:
        probes += [qb ^ (1 << i) ^ (1 << j) for i in range(bits) for j in range(i + 1, bits)]
    cand = bucketed.where(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_neardup_pairs(
    spark: SparkSession,
    df: DataFrame,
    *,
    dim: int,
    threshold: float = 0.95,
    bits: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ threshold that share an LSH bucket."""
    b = hyperplane_buckets(spark, df, dim=dim, bits=bits, seed=seed, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(
                cosine(F.col("l.v").cast("array<double>"), F.col("r.v").cast("array<double>")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
