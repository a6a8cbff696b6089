from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _one(spark, text, col_fn):
    return spark.createDataFrame([(text,)], "text string").select(
        col_fn(F.col("text")).alias("v")
    ).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count) == 3
    assert _one(spark, "", token_count) == 0
    assert _one(spark, "   ", token_count) == 0
    assert _one(spark, "one", token_count) == 1


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is in that house", lang_id) == "en"
    assert _one(spark, "der hund und die katze ist nicht ein tier zu", lang_id) == "de"
    assert _one(spark, "le chat et la maison est une belle que pour", lang_id) == "fr"
    assert _one(spark, "你好世界", lang_id) == "zh"
    assert _one(spark, "xyzzy qwerty", lang_id) == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, "Hello   World", fingerprint)
    b = _one(spark, "hello world", fingerprint)
    c = _one(spark, "hello worlds", fingerprint)
    assert a == b and a != c


def test_quality_score_bounds(spark):
    docs = [
        "the quick brown fox jumps over the lazy dog " * 5,
        "!!! ??? ... ,,,",
        "",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    vals = [r["q"] for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # real text beats punctuation soup


def test_tf_idf_terms_basic(spark):
    """tf counts multiplicity; idf = ln(N/df); a term in every doc scores 0."""
    import math

    from parallel_betweenness_centrality_using_bsp_spark.operators.features import tf_idf_terms

    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "apple cherry"), (2, "apple date")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["tfidf"]) for r in tf_idf_terms(df).collect()}
    assert rows[(0, "apple")][0] == 2
    assert abs(rows[(0, "apple")][1]) < 1e-12           # df == N -> idf 0
    assert abs(rows[(0, "banana")][1] - math.log(3.0)) < 1e-12


def test_deterministic_sample_stable_and_consistent(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import (
        deterministic_sample,
    )

    df = spark.createDataFrame([(i, "x") for i in range(2000)], "doc_id long, text string")
    a = {r["doc_id"] for r in deterministic_sample(df, 0.3).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, 0.3).collect()}
    assert a == b and 0.25 < len(a) / 2000 < 0.35
    # monotone: a smaller fraction is a subset of a larger one (stable splits)
    c = {r["doc_id"] for r in deterministic_sample(df, 0.1).collect()}
    assert c <= a


def test_training_mix_rates_nesting_and_plan(spark):
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import training_mix

    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    kept = training_mix(df, {"en": 0.8, "de": 0.2}, default_rate=0.05)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.72 < by_lang["en"] / 1000 < 0.88
    assert 0.14 < by_lang["de"] / 1000 < 0.26
    assert 0.01 < by_lang.get("zh", 0) / 1000 < 0.10  # default_rate path

    # nested across rate changes: the 20% en-mix is a subset of the 80% one
    small = training_mix(df, {"en": 0.2}, default_rate=0.0)
    big_ids = {r["doc_id"] for r in kept.where(F.col("lang") == "en").collect()}
    small_ids = {r["doc_id"] for r in small.collect()}
    assert small_ids and small_ids <= big_ids

    # deterministic: same call, same rows
    again = {r["doc_id"] for r in training_mix(df, {"en": 0.2}, default_rate=0.0).collect()}
    assert again == small_ids

    # the rates dim must land as a broadcast join, never a shuffle
    assert "BroadcastHashJoin" in kept._jdf.queryExecution().executedPlan().toString()


def test_unigram_surprisal_ranks_rare_tokens_higher(spark):
    import math

    from parallel_betweenness_centrality_using_bsp_spark.operators.features import unigram_surprisal

    df = spark.createDataFrame(
        [(0, "common common common common"),
         (1, "common common rareword unique"),
         (2, "common common common common")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tok"], r["surprisal"])
           for r in unigram_surprisal(df).collect()}
    assert got[0] == got[2]
    assert got[1][1] > got[0][1]  # rare tokens raise mean surprisal
    # doc 0: all 'common' (10 of 12 tokens) -> -ln(10/12) each
    assert math.isclose(got[0][1], -math.log(10 / 12), rel_tol=1e-9)
    # doc 1: 2x common + 2 singletons
    want1 = (2 * -math.log(10 / 12) + 2 * -math.log(1 / 12)) / 4
    assert math.isclose(got[1][1], want1, rel_tol=1e-9)


def test_bigram_pmi_matches_hand_count(spark):
    """PMI vs a pure-python recount on a tiny corpus (counts exact,
    ln float at 1e-12)."""
    import math
    from collections import Counter

    from parallel_betweenness_centrality_using_bsp_spark.operators.features import bigram_pmi

    corpus = [
        "new york is a big city",
        "new york has new parks",
        "a city has parks",
        "one",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = {
        (r["x"], r["y"]): (r["n_xy"], r["pmi"])
        for r in bigram_pmi(df, min_count=1).collect()
    }

    uni, big = Counter(), Counter()
    n_u = n_bg = 0
    for t in corpus:
        toks = t.split()
        uni.update(toks)
        n_u += len(toks)
        pairs = list(zip(toks, toks[1:]))
        big.update(pairs)
        n_bg += len(pairs)
    assert set(got) == set(big)
    for (x, y), c in big.items():
        want = math.log((c / n_bg) / ((uni[x] / n_u) * (uni[y] / n_u)))
        assert got[(x, y)][0] == c
        assert abs(got[(x, y)][1] - want) < 1e-12


def test_repetition_stats_hand_counts(spark):
    """'a b a b a': bigrams {a b:2, b a:2} -> top_bigram_frac = 2*2/5;
    trigrams {a b a:2, b a b:1} -> dup_trigram_frac = 3*2/5; distinct 2/5.
    A no-repeat doc scores 0 on both dup signals; clamps hold at 1.0."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import repetition_stats

    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "u v w x"), (2, "z z z z z z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 5
    assert abs(r0["distinct_ratio"] - 2 / 5) < 1e-12
    assert abs(r0["top_bigram_frac"] - 4 / 5) < 1e-12
    assert abs(r0["dup_trigram_frac"] - min(1.0, 6 / 5)) < 1e-12
    r1 = got[1]  # no repeats: top bigram still covers 2 of 4 tokens
    assert abs(r1["top_bigram_frac"] - 0.5) < 1e-12
    assert r1["dup_trigram_frac"] == 0.0
    assert r1["distinct_ratio"] == 1.0
    r2 = got[2]  # all-same: everything clamps to 1.0
    assert r2["top_bigram_frac"] == 1.0 and r2["dup_trigram_frac"] == 1.0


def test_ngram_overlap_flags_leaked_eval_text(spark):
    """A train doc containing a verbatim eval sentence gets n_hits > 0;
    an unrelated doc gets 0; overlap_frac = n_hits/n_grams exactly."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.features import ngram_overlap

    leak = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [(0, "prefix words here " + leak + " suffix words"),
         (1, "completely unrelated training text with no overlap at all")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_overlap(train, ev, n=20).collect()}
    assert got[0]["n_hits"] == len(leak) - 19  # every eval gram appears in doc 0
    assert got[1]["n_hits"] == 0 and got[1]["overlap_frac"] == 0.0
    assert abs(got[0]["overlap_frac"] - got[0]["n_hits"] / got[0]["n_grams"]) < 1e-12
    # hash and raw-string paths agree
    raw = {r["doc_id"]: r["n_hits"]
           for r in ngram_overlap(train, ev, n=20, hash_grams=False).collect()}
    assert raw == {d: r["n_hits"] for d, r in got.items()}
