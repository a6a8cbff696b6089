from parallel_betweenness_centrality_using_bsp_spark.operators.dedup import (
    dedup_keep_ids,
    exact_dedup,
    exact_duplicate_groups,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"


def test_exact_dedup(spark):
    df = _docs(
        spark,
        [
            (0, "hello world"),
            (1, "Hello   WORLD"),  # normalizes to same fingerprint
            (2, "different doc"),
            (3, "hello world"),
        ],
    )
    groups = exact_duplicate_groups(df).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 3 and groups[0]["keep_id"] == 0
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [0, 2]


def test_minhash_finds_near_duplicates(spark):
    near = BASE.replace("lazy", "sleepy")  # one word changed
    far = "completely unrelated text about spark shuffle partitions and joins here now"
    df = _docs(spark, [(0, BASE), (1, near), (2, far), (3, BASE)])
    pairs = {(r["a"], r["b"]) for r in minhash_dedup_pairs(df, threshold=0.5).collect()}
    assert (0, 3) in pairs  # identical
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup found
    assert all(2 not in p for p in pairs)  # unrelated never pairs


def test_minhash_jaccard_exact_for_identical(spark):
    df = _docs(spark, [(0, BASE), (1, BASE)])
    rows = minhash_dedup_pairs(df, threshold=0.99).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0


def test_simhash_near_duplicates(spark):
    near = BASE + " extra"
    far = "argmax softmax gradient descent tensor kernel epoch batchnorm dropout layer"
    df = _docs(spark, [(0, BASE), (1, near), (2, far), (3, BASE)])
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_dedup_pairs(df, max_hamming=3).collect()}
    assert pairs.get((0, 3)) == 0
    assert all(2 not in (a, b) for (a, b) in pairs)


def test_dedup_keep_ids_transitive_cluster(spark):
    # A~B and B~C: keep only A even though (A,C) was never emitted as a pair
    df = _docs(spark, [(10, "x"), (11, "x"), (12, "x"), (13, "y")])
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "a long, b long")
    kept = sorted(r["doc_id"] for r in dedup_keep_ids(spark, df, pairs).collect())
    assert kept == [10, 13]


def test_minhash_md5_family_matches_xxhash_semantics(spark):
    """The portable md5 family runs the identical LSH algorithm — identical
    docs always pair (all bands collide), verified jaccard identical."""
    near = BASE.replace("lazy", "sleepy")
    df = _docs(spark, [(0, BASE), (1, near), (2, BASE)])
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in minhash_dedup_pairs(df, threshold=0.5, hash_family="md5").collect()}
    assert pairs.get((0, 2)) == 1.0
    xx = {(r["a"], r["b"]): r["jaccard"]
          for r in minhash_dedup_pairs(df, threshold=0.5).collect()}
    assert pairs.get((0, 2)) == xx.get((0, 2))  # verify leg identical across families


def test_simhash_md5_family(spark):
    df = _docs(spark, [(0, BASE), (1, BASE + " extra"), (2, BASE),
                       (3, "argmax softmax gradient tensor kernel epoch")])
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_dedup_pairs(df, max_hamming=3, hash_family="md5").collect()}
    assert pairs.get((0, 2)) == 0
    assert all(3 not in (a, b) for (a, b) in pairs)


def test_bucket_cap_bounds_degenerate_bucket(spark, caplog):
    """100 identical docs put 100 rows in every band bucket — the cap must
    drop those buckets in bounded time AND log the truncation; distinct
    docs must still pair normally."""
    import logging

    rows = [(i, "same boilerplate text repeated everywhere always") for i in range(100)]
    rows += [(200, BASE), (201, BASE)]
    df = _docs(spark, rows)
    with caplog.at_level(logging.WARNING,
                         logger="parallel_betweenness_centrality_using_bsp_spark.operators.dedup"):
        pairs = {(r["a"], r["b"]) for r in
                 minhash_dedup_pairs(df, threshold=0.9, max_bucket_size=50).collect()}
    assert (200, 201) in pairs            # the small cohort still pairs
    assert all(a >= 200 for a, _ in pairs)  # degenerate bucket dropped entirely
    assert any("dropped" in r.message and "minhash_candidate_pairs" in r.message
               for r in caplog.records)


def test_bucket_cap_is_on_by_default(spark, monkeypatch):
    """The production-shaped default is CAPPED: calling the LSH pair
    operators without max_bucket_size must route through cap_buckets with
    DEFAULT_MAX_BUCKET_SIZE (None is the explicit opt-out)."""
    from parallel_betweenness_centrality_using_bsp_spark.operators import dedup as dedup_mod
    from parallel_betweenness_centrality_using_bsp_spark.operators import similarity as sim_mod
    from parallel_betweenness_centrality_using_bsp_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE

    calls = []
    real = dedup_mod.cap_buckets

    def spy(df, key_cols, max_bucket_size, what, drop_stats=None):
        calls.append((what, max_bucket_size))
        return real(df, key_cols, max_bucket_size, what, drop_stats)

    monkeypatch.setattr(dedup_mod, "cap_buckets", spy)

    df = _docs(spark, [(0, BASE), (1, BASE + " tail")])
    dedup_mod.minhash_candidate_pairs(df).collect()
    dedup_mod.simhash_dedup_pairs(df).collect()
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, -0.25]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    sim_mod.embedding_neardup_pairs(spark, emb, dim=4).collect()
    assert ("minhash_candidate_pairs", DEFAULT_MAX_BUCKET_SIZE) in calls
    assert ("simhash_dedup_pairs", DEFAULT_MAX_BUCKET_SIZE) in calls
    assert ("embedding_neardup_pairs", DEFAULT_MAX_BUCKET_SIZE) in calls
