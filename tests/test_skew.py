"""Salted-plan exactness: the skew toolkit must produce identical results to
the plain plans it replaces (north_rule: salting with exact semantics)."""
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.plans.skew import (
    detect_hubs,
    salted_join,
    split_by_hubs,
    two_phase_sum,
)
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import (
    random_power_law_graph,
)


def test_detect_hubs_finds_power_law_head(spark):
    g = random_power_law_graph(spark, 2000, 20000, seed=42)
    hubs = detect_hubs(g, "dst", threshold=100)
    got = {r.hub_key for r in hubs.collect()}
    # power-law dst concentrates on low ids; vertex 0 is the heaviest hub
    assert 0 in got
    oracle = {
        r.dst
        for r in g.groupBy("dst").count().where(F.col("count") > 100).collect()
    }
    assert got == oracle


def test_two_phase_sum_exact(spark):
    g = random_power_law_graph(spark, 1000, 30000, seed=7).withColumn(
        "w", (F.col("src") % 13).cast("double")
    )
    plain = {
        (r.dst): (r.s, r.c)
        for r in g.groupBy("dst")
        .agg(F.sum("w").alias("s"), F.sum(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r.dst): (r.s, r.c)
        for r in two_phase_sum(
            g.withColumn("one", F.lit(1)), ["dst"], {"s": "w", "c": "one"}, n_salts=8
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (s, c) in plain.items():
        s2, c2 = salted[k]
        assert c2 == c
        assert abs(s2 - s) < 1e-9


def test_salted_join_matches_plain_join(spark):
    g = random_power_law_graph(spark, 500, 10000, seed=9)
    frontier = spark.createDataFrame([(i,) for i in range(0, 50)], "dst long")
    plain = sorted(
        (r.dst, r.src) for r in frontier.join(g, "dst").select("dst", "src").collect()
    )
    salted = sorted(
        (r.dst, r.src)
        for r in salted_join(frontier, g, "dst", n_salts=4).select("dst", "src").collect()
    )
    assert plain == salted


def test_split_by_hubs_partitions_rows(spark):
    g = random_power_law_graph(spark, 1000, 20000, seed=11)
    hubs = detect_hubs(g, "dst", threshold=200)
    hub_rows, tail_rows = split_by_hubs(g, hubs, "dst")
    assert hub_rows.count() + tail_rows.count() == g.count()
    assert hub_rows.join(tail_rows, ["src", "dst"], "inner").count() == 0


def test_asof_bucketed_matches_plain_under_hot_key(spark):
    """One key holds 50% of all rows (the hot-key shape that serializes a
    single window partition); ts_buckets must (a) reproduce the plain
    answer exactly and (b) bound every (key, bucket) window group far below
    the hot key's row count."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.asof import asof_prev

    hot = [(i, 99, 10 * i + (i % 3)) for i in range(2000)]          # key 99: 2000 rows
    cold = [(10_000 + i, i % 40, 7 * i + 3) for i in range(2000)]   # 40 cold keys
    anchors = spark.createDataFrame(
        [(e, k, t) for (e, k, t) in hot + cold if e % 2 == 0],
        "event_id long, k long, ts long",
    )
    refs = spark.createDataFrame(
        [(k, t) for (e, k, t) in hot + cold if e % 2 == 1], "k long, ts long"
    )
    plain = sorted(
        (r.event_id, r.prev)
        for r in asof_prev(anchors, refs, ["k"], "ts", out_col="prev").collect()
    )
    bucketed = sorted(
        (r.event_id, r.prev)
        for r in asof_prev(
            anchors, refs, ["k"], "ts", out_col="prev", ts_buckets=16
        ).collect()
    )
    assert plain == bucketed

    # per-window-partition bound: the hot key's rows spread over the buckets
    lo, hi, s = 0, 10 * 1999 + 1, 16
    span = hi - lo + 1
    sizes = (
        anchors.select("k", "ts")
        .unionByName(refs.select("k", F.col("ts")))
        .withColumn("_b", F.floor((F.col("ts") - lo) * s / span))
        .groupBy("k", "_b")
        .count()
    )
    hot_max = sizes.where(F.col("k") == 99).agg(F.max("count")).first()[0]
    assert hot_max <= 300  # 2000-row hot key split across ~16 groups


def test_salted_join_rejects_non_inner(spark):
    import pytest
    from parallel_betweenness_centrality_using_bsp_spark.plans.skew import salted_join

    small = spark.createDataFrame([(1, "a")], "k long, v string")
    big = spark.createDataFrame([(1, 10)], "k long, x long")
    with pytest.raises(ValueError, match="inner"):
        salted_join(small, big, "k", how="left")
