"""Fixed-round k-means (quantized family) and Okapi BM25 vs local
references that replay the identical rounding semantics."""
import math

import numpy as np

from parallel_betweenness_centrality_using_bsp_spark.operators.features import bm25_scores
from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import kmeans_rounds


def _vec_df(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def _ref_kmeans(vecs: np.ndarray, k: int, rounds: int):
    """Replay kmeans_rounds in numpy: 6dp-rounded centroids and distances,
    argmin ties to the lower centroid id (np.argmin's convention)."""
    cent = np.round(vecs[:k], 6)
    asg = d2 = None
    for r in range(rounds):
        d2_all = np.round(((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), 6)
        asg = np.argmin(d2_all, axis=1)
        d2 = d2_all[np.arange(len(vecs)), asg]
        if r < rounds - 1:
            cent = np.stack(
                [
                    np.round(vecs[asg == c].mean(axis=0), 6)
                    if (asg == c).any()
                    else cent[c]
                    for c in range(k)
                ]
            )
    return asg, d2


def test_kmeans_rounds_matches_numpy_replay(spark):
    df, vecs = _vec_df(spark)
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_rounds(spark, df, k=4, rounds=2).collect()
    }
    asg, d2 = _ref_kmeans(vecs, 4, 2)
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i][0] == asg[i], f"vec {i}: cluster {got[i][0]} != {asg[i]}"
        assert abs(got[i][1] - d2[i]) < 1e-9, f"vec {i}: d2 {got[i][1]} != {d2[i]}"


def test_kmeans_round1_seeds_own_cluster(spark):
    # round 1 assigns each seed vector to its own centroid at distance 0
    df, _ = _vec_df(spark, n=30)
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_rounds(spark, df, k=4, rounds=1).collect()
    }
    for i in range(4):
        assert got[i][0] == i
        assert got[i][1] < 1e-9


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    tf = {d: {} for d, _ in docs}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    n = len(docs)
    dfq = {}
    for d in tf:
        for t in tf[d]:
            dfq[t] = dfq.get(t, 0) + 1
    dl = {d: sum(tf[d].values()) for d in tf}
    avgdl = sum(dl.values()) / n
    out = {}
    for d in tf:
        s = 0.0
        for t in query:
            f = tf[d].get(t, 0)
            if not f:
                continue
            idf = math.log(1.0 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
        if s:
            out[d] = s
    return out


def test_bm25_matches_reference(spark):
    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana banana cherry cherry cherry"),
        (2, "apple date elderberry fig grape honeydew"),
        (3, "cherry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["apple", "cherry"]).collect()
    }
    want = _ref_bm25(docs, ["apple", "cherry"])
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_bm25_derived_query_is_top_df_terms(spark):
    # 'cherry' appears in 3 docs, 'apple'/'banana' in 2 — the in-plan query
    # must pick (cherry, apple) (df desc, then term asc breaks the tie)
    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana banana cherry"),
        (2, "apple date cherry"),
        (3, "date fig"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df).collect()}
    want = _ref_bm25(docs, ["cherry", "apple"])
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_kmeans_seeds_noncontiguous_ids(spark):
    """Seeding uses the k SMALLEST actual ids — 1000-based sparse ids still
    get exactly k centroids (regression for the `id < k` under-seed bug)."""
    import pyspark.sql.functions as F

    df, vecs = _vec_df(spark, n=20)
    shifted = df.withColumn("vec_id", F.col("vec_id") + 1000)
    got = {
        r["vec_id"] - 1000: (r["cluster"] - 1000, r["d2"])
        for r in kmeans_rounds(spark, shifted, k=4, rounds=2).collect()
    }
    base = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_rounds(spark, df, k=4, rounds=2).collect()
    }
    assert got == base
    assert len({c for c, _ in got.values()}) > 1


def test_kmeans_raises_when_fewer_than_k(spark):
    import pytest

    df, _ = _vec_df(spark, n=3)
    with pytest.raises(ValueError, match="only 3 distinct"):
        kmeans_rounds(spark, df, k=4, rounds=1)
