"""Deduplication operators over a documents table — the training-data
pipeline's workhorses at 100 TB.

Five families, all shuffle-disciplined:

* ``exact``        — sha256-fingerprint groupBy (one shuffle on the hash,
                     perfectly balanced keys).
* ``minhash LSH``  — shingle → k-MinHash signature (JVM-side, see
                     functions/hashing.py) → band keys → bucket join →
                     exact-Jaccard verification.  The candidate self-join
                     happens per (band, band_hash) bucket, so work scales
                     with bucket sizes, never n².
* ``simhash``      — 64-bit fingerprint (codegen'd bit-vote aggregation)
                     → 16-bit chunk buckets (within hamming≤3, two
                     fingerprints share ≥1 of 4 chunks) → bit_count
                     verification, all JVM-side.
* ``n-gram Jaccard`` — exact verify pass reusable standalone on any
                     candidate pair set.
* ``embedding near-dup`` — random-hyperplane LSH over embedding columns →
                     cosine verification (see similarity.py).

``dedup_keep_ids`` turns any duplicate-pair set into a kept-set by running
the engine's own connected-components over the pair graph (duplicate
clusters are rarely just pairs) and keeping the minimum id per cluster.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.hashing import (
    band_keys,
    band_keys_join,
    hamming64,
    jaccard,
    minhash_signatures_agg,
    minhash_signatures_md5,
    simhash_band,
    simhash_band15,
    simhash_signatures_agg,
    simhash_signatures_md5,
    word_shingles,
)
from parallel_betweenness_centrality_using_bsp_spark.functions.text import fingerprint, tokens
from parallel_betweenness_centrality_using_bsp_spark.plans.superstep import guard_stats

log = logging.getLogger(__name__)

# Default LSH bucket cap: 10k rows per bucket bounds any bucket self-join at
# 10^8 candidate pairs — painful but finite — where an uncapped degenerate
# bucket (one boilerplate cluster holding 10^6 docs in a 100 TB corpus) is
# 10^12 pairs, a job-killer.  The production-shaped default is therefore
# CAPPED; pass ``max_bucket_size=None`` to opt out explicitly.  Drops are
# always logged (no silent caps).
DEFAULT_MAX_BUCKET_SIZE = 10_000


def cap_buckets(
    df: DataFrame,
    key_cols: list[str],
    max_bucket_size: int,
    what: str,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` — and LOG what was
    dropped (the survey's skew rule: no silent caps).  Pass a dict as
    ``drop_stats`` to ALSO receive ``{"dropped_buckets": int,
    "dropped_rows": int}`` programmatically — pipelines that must alert on
    recall loss shouldn't have to scrape logs.

    .. note:: since r3 the near-dup entry points (minhash/simhash/embedding)
       default to ``max_bucket_size=DEFAULT_MAX_BUCKET_SIZE`` (10,000) —
       previously uncapped.  Callers that need every candidate pair from
       degenerate buckets must opt out with ``max_bucket_size=None``.

    A degenerate bucket (boilerplate-heavy corpus, constant shingle) makes
    the bucket self-join quadratic: one 10^6-row bucket is 10^12 candidate
    pairs.  Capping bounds the worst case at max_bucket_size² per bucket.
    Rows in dropped buckets lose those candidate pairs — run EXACT dedup
    first (identical docs share *all* bands, so a giant identical-doc group
    is exactly the degenerate case this guards against) and treat the logged
    buckets as their own dedup cohort if recall there matters.
    """
    sizes = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    # Materialize the (tiny by construction) oversized-bucket set ONCE: both
    # the stats scan and the returned lazy anti-join read the checkpoint, so
    # the full bucket-size aggregation never recomputes when the caller
    # finally executes the candidate join.
    over = sizes.where(F.col("_n") > max_bucket_size).localCheckpoint(eager=True).transform(guard_stats)
    stats = over.agg(
        F.count(F.lit(1)).alias("buckets"), F.coalesce(F.sum("_n"), F.lit(0)).alias("rows")
    ).first()
    if drop_stats is not None:
        drop_stats["dropped_buckets"] = int(stats["buckets"])
        drop_stats["dropped_rows"] = int(stats["rows"])
    if not stats["buckets"]:
        # common case: nothing oversized — keep the anti-join out of the
        # plan entirely instead of joining against an empty set
        return df
    log.warning(
        "%s: dropped %d oversized LSH bucket(s) totaling %d rows "
        "(max_bucket_size=%d); candidate pairs within them are NOT emitted",
        what, stats["buckets"], stats["rows"], max_bucket_size,
    )
    # no forced broadcast: the oversized-bucket key set is usually tiny, but
    # a small cap over a skewed corpus can make it arbitrarily large — the
    # checkpoint gives AQE exact sizes, so it picks broadcast vs shuffle
    # anti-join itself
    return df.join(over.select(*key_cols), key_cols, "left_anti")


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fp, n_docs, keep_id) per group of byte-identical (post-normalization)
    docs with n_docs > 1."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Input rows minus exact duplicates (keeps the minimum id per group)."""
    w = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w.select(id_col), id_col, "left_semi")


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    drop_stats: dict | None = None,
) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH band bucket, a < b, distinct.

    ``hash_family="xxhash64"`` (default) is the fast bulk path;
    ``"md5"`` computes engine-portable signatures (min of md5 hex strings)
    that a DuckDB oracle reproduces exactly — the family the driver's
    value-hash gate runs against.  ``max_bucket_size`` caps degenerate
    buckets before the self-join (logged, see ``cap_buckets``); capped is
    the default — pass ``None`` to opt out explicitly.
    """
    rows = num_hashes // bands
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    if hash_family == "md5":
        keyed = minhash_signatures_md5(shingled, "id", "sh", num_hashes).withColumn(
            "bk", band_keys_join(F.col("sig"), bands, rows)
        )
    else:
        keyed = minhash_signatures_agg(shingled, "id", "sh", num_hashes, seed).withColumn(
            "bk", band_keys(F.col("sig"), bands, rows)
        )
    sig = (
        keyed.select("id", F.posexplode("bk").alias("band", "bh"))
        # Materialize ONCE: the self-join below would otherwise re-run the
        # whole shingle+signature pipeline for each side.
        .localCheckpoint(eager=True).transform(guard_stats)
    )
    if max_bucket_size is not None:
        sig = cap_buckets(sig, ["band", "bh"], max_bucket_size,
                          "minhash_candidate_pairs", drop_stats)
    left = sig.alias("l")
    right = sig.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard verification of (a, b) pairs → (a, b, jaccard) ≥ threshold."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    return (
        pairs.join(sh.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
        .select("a", "b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    drop_stats: dict | None = None,
) -> DataFrame:
    """MinHash-LSH candidates, exact-Jaccard verified: (a, b, jaccard).
    ``drop_stats`` (a dict) receives dropped_buckets/dropped_rows counts
    from the bucket cap — see ``cap_buckets``."""
    cand = minhash_candidate_pairs(
        df, text_col, id_col,
        shingle_n=shingle_n, num_hashes=num_hashes, bands=bands, seed=seed,
        hash_family=hash_family, max_bucket_size=max_bucket_size,
        drop_stats=drop_stats,
    )
    return ngram_jaccard_pairs(
        df, cand, text_col, id_col, shingle_n=shingle_n, threshold=threshold
    )


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    drop_stats: dict | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: (a, b, hamming ≤ max_hamming).

    Bucketing by four equal chunks guarantees recall for hamming ≤ 3
    (pigeonhole); verification is JVM-side bit_count.  The fingerprint is
    the codegen'd bit-vote aggregation — the whole pipeline is JVM-side.
    ``hash_family="md5"`` swaps in the 60-bit engine-portable family whose
    DuckDB oracle reproduces fingerprints exactly (token source is then
    regexp-extracted so zero-token docs drop identically in both engines).
    """
    if hash_family == "md5":
        toks = F.regexp_extract_all(F.lower(F.trim(F.col(text_col))), F.lit(r"\S+"), 0)
        fps = simhash_signatures_md5(
            df.select(F.col(id_col).alias("id"), toks.alias("_toks")), "id", "_toks"
        )
        band_fn = simhash_band15
    else:
        fps = simhash_signatures_agg(
            # coalesce: null text still fingerprints (as the empty doc) — a
            # corpus's null rows pair with each other instead of vanishing
            df.select(
                F.col(id_col).alias("id"),
                tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
            ),
            "id",
            "_toks",
        )
        band_fn = simhash_band
    chunks = fps.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_fn(F.col("fp"), b).alias("key"))
                for b in range(4)
            ])
        ).alias("c"),
    ).select("id", "fp", F.col("c.band").alias("band"), F.col("c.key").alias("key"))
    # Materialize ONCE so the self-join doesn't recompute the 60-64
    # aggregation pipeline for each side.
    chunks = chunks.localCheckpoint(eager=True).transform(guard_stats)
    if max_bucket_size is not None:
        chunks = cap_buckets(chunks, ["band", "key"], max_bucket_size,
                             "simhash_dedup_pairs", drop_stats)
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            hamming64(F.col("l.fp"), F.col("r.fp")).alias("hamming"),
        )
        .dropDuplicates(["a", "b"])
        .where(F.col("hamming") <= max_hamming)
    )


def dedup_keep_ids(spark: SparkSession, df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Kept ids after clustering duplicate pairs (connected components over
    the pair graph, keep min id per cluster).  Duplicate clusters are
    transitive — A~B, B~C must drop both B and C — so this reuses the
    engine's own hash-min components rather than naive pair filtering."""
    from parallel_betweenness_centrality_using_bsp_spark.operators.components import connected_components

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    if edges.isEmpty():
        return df.select(F.col(id_col))
    labels = connected_components(spark, edges).state
    drop = labels.where(F.col("vertex") != F.col("label")).select(
        F.col("vertex").alias(id_col)
    )
    return df.select(F.col(id_col)).join(drop, id_col, "left_anti")
