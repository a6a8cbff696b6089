import numpy as np

from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    embedding_neardup_pairs,
    hyperplane_buckets,
)


def _vec_df(spark, n=200, dim=16, seed=1):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_brute_force_matches_numpy(spark):
    df, vecs = _vec_df(spark)
    q = vecs[0].astype(np.float64)
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = list(np.argsort(-cos)[:5])
    got = [r["vec_id"] for r in brute_force_topk(df, q.tolist(), 5).collect()]
    assert got == want
    assert got[0] == 0  # query itself


def test_ann_recall_contains_self_and_near(spark):
    df, vecs = _vec_df(spark, n=300)
    # plant a near-duplicate of vector 7
    near = (vecs[7] + np.float32(0.01)).tolist()
    df = df.union(spark.createDataFrame([(999, near)], "vec_id long, embedding array<float>"))
    got = [r["vec_id"] for r in ann_topk(spark, df, vecs[7].tolist(), 5, bits=8, probe_hamming=1).collect()]
    assert 7 in got and 999 in got


def test_buckets_deterministic(spark):
    df, _ = _vec_df(spark, n=50)
    a = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(spark, df, dim=16, bits=8).collect()}
    b = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(spark, df, dim=16, bits=8).collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_embedding_neardup(spark):
    df, vecs = _vec_df(spark, n=100)
    dup = (vecs[3] * np.float32(2.0)).tolist()  # same direction, cos = 1
    df = df.union(spark.createDataFrame([(555, dup)], "vec_id long, embedding array<float>"))
    pairs = {(r["a"], r["b"]): r["cos"] for r in
             embedding_neardup_pairs(spark, df, dim=16, threshold=0.99).collect()}
    assert (3, 555) in pairs and pairs[(3, 555)] >= 0.999


def test_ann_quantized_matches_python_buckets_and_recalls(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import (
        ann_topk_quantized,
        bucket_of_quantized,
        hyperplane_buckets_quantized,
        quantized_hyperplanes,
    )

    df, vecs = _vec_df(spark, n=200, dim=16)
    planes = quantized_hyperplanes(16, 8, seed=42)
    # Spark bucket codes == driver-side integer arithmetic, vector by vector
    got = {r["vec_id"]: r["bucket"]
           for r in hyperplane_buckets_quantized(df, planes).collect()}
    for i in range(0, 200, 17):
        assert got[i] == bucket_of_quantized(vecs[i].tolist(), planes)
    # self is always recalled (its bucket is probed at hamming 0)
    top = [r["vec_id"] for r in
           ann_topk_quantized(spark, df, vecs[7].tolist(), 5, bits=8, probe_hamming=1).collect()]
    assert 7 in top


def test_persisted_ann_index_prunes_partitions(spark, tmp_path):
    from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import (
        ann_topk_indexed,
        build_ann_index,
    )

    df, vecs = _vec_df(spark, n=200, dim=16)
    path = str(tmp_path / "ann_index")
    build_ann_index(spark, df, path, dim=16, bits=6)
    top = ann_topk_indexed(spark, path, vecs[7].tolist(), 5, bits=6, probe_hamming=1)
    got = [r["vec_id"] for r in top.collect()]
    assert 7 in got and len(got) == 5
    # the probe filter must reach the parquet scan as a PARTITION filter
    plan = top._sc._jvm.PythonSQLUtils.explainString(
        top._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_quantized_index_prunes_and_matches_full_scan(spark, tmp_path):
    """The oracle-gated serving path: the quantized index probe must (a)
    prune partitions and (b) return exactly the full-scan quantized answer
    (same planes ⇒ same probe set)."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import (
        ann_topk_indexed_quantized,
        ann_topk_quantized,
        build_ann_index_quantized,
    )

    df, vecs = _vec_df(spark, n=200, dim=16)
    path = str(tmp_path / "qidx")
    build_ann_index_quantized(spark, df, path, dim=16, bits=8)
    top = ann_topk_indexed_quantized(spark, path, vecs[7].tolist(), 5, bits=8, probe_hamming=1)
    got = [(r["vec_id"], r["cos"]) for r in top.collect()]
    want = [
        (r["vec_id"], r["cos"])
        for r in ann_topk_quantized(
            spark, df, vecs[7].tolist(), 5, bits=8, probe_hamming=1
        ).collect()
    ]
    assert got == want and 7 in [v for v, _ in got]
    import re

    plan = top._sc._jvm.PythonSQLUtils.explainString(
        top._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_ivf_topk_recall_and_determinism(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.similarity import (
        ivf_topk,
        train_ivf,
    )

    df, vecs = _vec_df(spark, n=300, dim=16)
    c1 = train_ivf(spark, df, k=8, iters=3)
    c2 = train_ivf(spark, df, k=8, iters=3)
    assert np.allclose(c1, c2)  # deterministic training
    # a planted near-duplicate must land in the same probed cluster
    near = (vecs[7] + np.float32(0.01)).tolist()
    df2 = df.union(spark.createDataFrame([(999, near)], "vec_id long, embedding array<float>"))
    got = [r["vec_id"] for r in ivf_topk(spark, df2, c1, vecs[7].tolist(), 5, nprobe=2).collect()]
    assert 7 in got and 999 in got
