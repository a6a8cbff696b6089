from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.operators.walks import (
    indexed_adjacency,
    random_walks,
    random_walks_run,
    walk_corpus_from_checkpoints,
)
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import latest_checkpoint
from parallel_betweenness_centrality_using_bsp_spark.sources.graphs import edge_df

from tests.oracles import er_graph


def test_walks_deterministic_and_valid(spark):
    edges = er_graph(n=60, p=0.1, seed=4)
    eset = set()
    for u, v in edges:
        eset.add((u, v))
        eset.add((v, u))
    e = edge_df(spark, edges)
    starts = spark.createDataFrame([(i,) for i in range(10)], "vertex long")
    a = random_walks(spark, e, starts, walk_length=5).collect()
    b = random_walks(spark, e, starts, walk_length=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_walk = {}
    for r in a:
        by_walk.setdefault(r["walk_id"], {})[r["pos"]] = r["vertex"]
    for wid, steps in by_walk.items():
        assert steps[0] == wid
        for k in range(1, max(steps) + 1):
            assert (steps[k - 1], steps[k]) in eset  # every hop is a real edge


def test_walks_stop_at_sinks(spark):
    # directed path 0->1->2: walks from 0 must stop at vertex 2
    e = edge_df(spark, [(0, 1), (1, 2)])
    starts = spark.createDataFrame([(0,)], "vertex long")
    rows = random_walks(spark, e, starts, walk_length=5, directed=True).collect()
    got = {r["pos"]: r["vertex"] for r in rows}
    assert got == {0: 0, 1: 1, 2: 2}  # no pos 3+: the walk died at the sink


def test_walks_resume_mid_walk(spark, tmp_path):
    edges = er_graph(n=50, p=0.12, seed=9)
    e = edge_df(spark, edges)
    starts = spark.createDataFrame([(i,) for i in range(8)], "vertex long")
    ckpt = str(tmp_path / "ck")

    want = sorted(map(tuple, random_walks(spark, e, starts, walk_length=6).collect()))

    # crash after 2 hops, resume from the checkpoint; walk_length is the
    # ABSOLUTE target, so the resumed run advances only the remaining 4
    # hops (passing the same 6 twice must NOT produce length-8 walks)
    random_walks_run(
        spark, e, starts, walk_length=2, checkpoint_dir=ckpt, run_id="w"
    )
    step, state = latest_checkpoint(spark, ckpt, "walks", "w")
    assert step == 2
    run, _ = random_walks_run(
        spark, e, starts, walk_length=6, checkpoint_dir=ckpt, run_id="w",
        resume_state=state, start_step=step,
    )
    assert run.supersteps == 4
    got = sorted(
        map(tuple, walk_corpus_from_checkpoints(spark, ckpt, "w").collect())
    )
    assert got == want


def test_indexed_adjacency_salted_matches_unsalted(spark):
    # one hub (vertex 0) holding most edges — the skew shape the salted
    # numbering parallelizes; indices must be identical either way
    edges = [(0, v) for v in range(1, 120)] + [(1, 2), (3, 4), (2, 7)]
    e = edge_df(spark, edges)
    plain, _ = indexed_adjacency(e)
    salted, _ = indexed_adjacency(e, salt_buckets=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salted window really splits the hub: every (src, bucket) group is
    # far smaller than the hub degree
    lo, hi = 1, 119
    b = salted.withColumn(
        "_b", F.floor((F.col("dst") - F.lit(lo)) * 8 / F.lit(hi - lo + 1))
    )
    sizes = [
        r["n"]
        for r in b.groupBy("src", "_b").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(sizes) <= 20  # 119-degree hub split into ≥8 window groups


def _md5int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_node2vec_matches_python_replay(spark):
    """Exact corpus vs a pure-python second-order replay: same md5 stream,
    integer weights {q, p*q, p}, cumulative pick over dst-ordered
    candidates."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.walks import node2vec_walks
    from tests.oracles import er_graph

    edges = er_graph(50, 0.10, seed=21)
    p_ret, q_io = 4, 2
    nbrs = {}
    eset = set()
    for u, v in edges:
        if u == v:
            continue
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
        eset.add((u, v))
        eset.add((v, u))
    starts = sorted(nbrs)[:12]

    expect = set()
    for s in starts:
        prev, cur = -1, s
        expect.add((s, 0, s))
        for k in range(1, 4):
            cands = sorted(nbrs.get(cur, ()))
            if not cands:
                break
            ws = [
                q_io if c == prev else (p_ret * q_io if (prev, c) in eset else p_ret)
                for c in cands
            ]
            r = _md5int(f"{s}:{k}") % sum(ws)
            acc = 0
            for c, w in zip(cands, ws):
                acc += w
                if acc > r:
                    prev, cur = cur, c
                    break
            expect.add((s, k, cur))

    df = spark.createDataFrame([(u, v) for u, v in edges], "src long, dst long")
    st = spark.createDataFrame([(s,) for s in starts], "vertex long")
    got = {
        (r["walk_id"], r["pos"], r["vertex"])
        for r in node2vec_walks(spark, df, st, walk_length=3, p=p_ret, q=q_io).collect()
    }
    assert got == expect


def test_node2vec_p1q1_equals_deepwalk(spark):
    """p=q=1 collapses the bias to uniform: unit weights make the
    cumulative pick EXACTLY the md5 %% deg index of random_walks — the two
    corpora must be bit-identical."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.walks import (
        node2vec_walks,
        random_walks,
    )
    from tests.oracles import er_graph

    edges = er_graph(40, 0.12, seed=5)
    df = spark.createDataFrame([(u, v) for u, v in edges], "src long, dst long")
    st = spark.createDataFrame([(s,) for s in range(10)], "vertex long")
    a = {
        (r["walk_id"], r["pos"], r["vertex"])
        for r in node2vec_walks(spark, df, st, walk_length=4, p=1, q=1).collect()
    }
    b = {
        (r["walk_id"], r["pos"], r["vertex"])
        for r in random_walks(spark, df, st, walk_length=4).collect()
    }
    assert a == b


def test_skipgram_pairs_hand_count(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.walks import skipgram_pairs

    corpus = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 10), (1, 0, 20), (1, 1, 21)],
        "walk_id long, pos long, vertex long",
    )
    got = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(corpus, 2).collect()}
    want = {}
    walks = {0: [10, 11, 12, 10], 1: [20, 21]}
    for seq in walks.values():
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
    assert got == want
