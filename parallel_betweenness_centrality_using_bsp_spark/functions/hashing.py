"""Hash-family column functions: shingles, MinHash, SimHash.

MinHash stays entirely JVM-side: k hash functions are ``xxhash64(shingle,
seed_i)`` and the signature is ``array_min`` over a higher-order
``transform`` — no Python in the loop, so signatures compute inside
whole-stage codegen over arbitrarily wide data.

SimHash is JVM-side too: explode tokens, one ``xxhash64`` per token, then
64 codegen'd bit-vote sum-aggregations — the same aggregation shape as
MinHash, no Python anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.text import tokens


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; docs with < n tokens yield one whole-doc shingle."""
    t = tokens(col)
    k = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.array_distinct(grams)


def _salted_hash(salt: int):
    # Arity-1 closure: a `lambda s, i=i:` would have arity 2 and transform()
    # would pass the ARRAY INDEX as the second arg, silently collapsing all
    # k hash functions into one.
    return lambda s: F.xxhash64(s, F.lit(salt))


def minhash_signature(shingles: Column, k: int = 32, seed: int = 42) -> Column:
    """array<long> of k MinHash values (min over xxhash64(shingle, seed+i)).

    Column-expression form; fine for small k / narrow rows.  Higher-order
    functions evaluate interpreted (outside whole-stage codegen), so the hot
    path for bulk dedup is ``minhash_signatures_agg`` below.
    """
    return F.array(
        *[F.array_min(F.transform(shingles, _salted_hash(seed + i))) for i in range(k)]
    )


def minhash_signatures_agg(
    df, id_col: str, shingle_col: str, k: int = 32, seed: int = 42
):
    """(id, sig array<long>) via explode + k codegen'd min-aggregations.

    Identical values to ``minhash_signature`` (same xxhash64 family), but the
    per-shingle hashing runs inside whole-stage codegen and the k mins are
    one map-side-combined hash aggregation — at 100 TB this is a single
    shuffle on ``id`` with k·8-byte partial states, vs an interpreted
    per-row HOF loop."""
    ex = df.select(F.col(id_col).alias("id"), F.explode(shingle_col).alias("_sh"))
    aggs = [
        F.min(F.xxhash64("_sh", F.lit(seed + i))).alias(f"_h{i}") for i in range(k)
    ]
    return (
        ex.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"_h{i}" for i in range(k)]).alias("sig"))
    )


def minhash_signatures_md5(df, id_col: str, shingle_col: str, k: int = 32):
    """(id, sig array<string>) — the PORTABLE MinHash family: value i is the
    lexicographic MIN of ``md5(i || ':' || shingle)`` hex strings.

    md5 hex + bytewise string-min are identical in every engine, so a DuckDB
    oracle reproduces these signatures digit-for-digit — this family exists
    to put the *whole LSH pipeline* (not just its verify leg) under the
    value-hash gate.  Costs ~2-3× the ``xxhash64`` family
    (``minhash_signatures_agg``), which stays the bulk-dedup default.
    Same shuffle shape: explode + k codegen'd min-aggregations.
    """
    ex = df.select(F.col(id_col).alias("id"), F.explode(shingle_col).alias("_sh"))
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("_sh")))).alias(f"_h{i}")
        for i in range(k)
    ]
    return (
        ex.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"_h{i}" for i in range(k)]).alias("sig"))
    )


def band_keys_join(signature: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> LSH band keys for a STRING signature array: each band is
    the '|'-join of its slice (md5 hex never contains '|', so unambiguous)."""
    return F.array(
        *[
            F.array_join(F.slice(signature, b * rows_per_band + 1, rows_per_band), "|")
            for b in range(bands)
        ]
    )


SIMHASH_MD5_BITS = 60  # 15 hex chars → a non-negative BIGINT in any engine


def md5_token_value(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — computed identically in
    Spark (``conv(substring(md5, 1, 15), 16, 10)``) and DuckDB
    (``('0x' || substr(md5, 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_signatures_md5(df, id_col: str, token_col):
    """(id, fp long): 60-bit md5-family SimHash — the portable twin of
    ``simhash_signatures_agg`` (same bit-vote aggregation, md5-derived token
    hashes instead of xxhash64) so a DuckDB oracle reproduces fingerprints
    exactly.  Docs whose token array is empty produce no row (explode drops
    them) — mirror the oracle's token extraction accordingly."""
    ex = df.select(F.col(id_col).alias("id"), F.explode(token_col).alias("_tok")).select(
        "id", md5_token_value(F.col("_tok")).alias("_h")
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"_v{i}")
        for i in range(SIMHASH_MD5_BITS)
    ]
    agg = ex.groupBy("id").agg(*votes)
    fp = None
    for i in range(SIMHASH_MD5_BITS):
        term = (
            F.when(F.col(f"_v{i}") > 0, F.lit(1 << i).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        fp = term if fp is None else fp + term
    return agg.select("id", fp.alias("fp"))


def simhash_band15(col: Column, band: int) -> Column:
    """15-bit chunk #band (0..3) of a 60-bit md5-family fingerprint — within
    hamming ≤ 3 two fingerprints share ≥1 of the 4 chunks (pigeonhole)."""
    return F.shiftrightunsigned(col, band * 15).bitwiseAND(F.lit(0x7FFF))


def band_keys(signature: Column, bands: int, rows_per_band: int, seed: int = 7) -> Column:
    """array<long> of LSH band hashes (hash of each signature slice)."""
    return F.array(
        *[
            F.xxhash64(F.slice(signature, b * rows_per_band + 1, rows_per_band), F.lit(seed))
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (deduplicated) shingle arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def simhash_signatures_agg(df, id_col: str, token_col, seed: int = 42):
    """(id, fp long): 64-bit SimHash (Charikar 2002) entirely JVM-side.

    Explode tokens → one ``xxhash64`` per token → 64 codegen'd bit-vote
    sum-aggregations (+1/−1 per bit) → sign of each vote assembles the
    fingerprint in two's complement (bit 63's term is Long.MIN_VALUE, so
    the sum never overflows ANSI arithmetic).  Replaces the r1 per-character
    Python FNV loop inside a pandas UDF — same ``minhash_signatures_agg``
    shape: one map-side-combined shuffle on ``id`` with 64×8-byte partial
    states, whole-stage codegen end to end, no Python in the hot path.
    Token *multiplicity* votes (duplicates weigh), matching classic SimHash.
    """
    ex = df.select(F.col(id_col).alias("id"), F.explode(token_col).alias("_tok")).select(
        "id", F.xxhash64("_tok", F.lit(seed)).alias("_h")
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    agg = ex.groupBy("id").agg(*votes)
    fp = None
    for i in range(64):
        term = (
            F.when(
                F.col(f"_v{i}") > 0,
                F.lit(-(2**63) if i == 63 else (1 << i)).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        fp = term if fp is None else fp + term
    return agg.select("id", fp.alias("fp"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints — pure JVM bit ops."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band(col: Column, band: int) -> Column:
    """16-bit chunk #band (0..3) of a 64-bit simhash — SimHash LSH key:
    fingerprints within hamming distance 3 share at least one chunk."""
    return F.shiftrightunsigned(col, band * 16).bitwiseAND(F.lit(0xFFFF))
