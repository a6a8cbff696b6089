"""Explicit skew handling: hub detection + salted joins/aggregations.

The north rule requires explicit handling of high-degree hubs ("salting of
high-degree hubs ... to control shuffle skew", BASELINE.json north_star).
AQE's skew-join splitting is the always-on second line of defense
(session.py); the operators here are the *explicit* first line for plans AQE
can't fix — e.g. a hub key whose rows overflow one reducer in a
shuffled-hash join, or a frontier×edges join where one frontier vertex owns
10^8 edges.

Both primitives are EXACT (no sampling, no approximation):

* ``two_phase_sum``    — groupBy(keys+salt) partial sums, then groupBy(keys)
                         final sums.  Sum/count/min/max are associative, so
                         the two-phase result is bit-identical for
                         longs/exact types and equal up to float association
                         order for doubles (hence the engine-wide 1e-6
                         tolerance on float scores).
* ``salted_join``      — replicate the SMALL side once per salt value,
                         deterministically salt the BIG side from its full
                         row content, join on (key, salt).  A hub key's rows
                         spread over ``n_salts`` reducers instead of one.

``detect_hubs`` finds the keys worth salting so callers can split their
data: salted plan for hub keys, plain plan for the long tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hubs(edges: DataFrame, key: str = "dst", threshold: int = 100_000) -> DataFrame:
    """Keys whose degree exceeds ``threshold``: (key, degree).

    One map-side-combined count — cheap even at 10^12 edges (output is only
    the hub set, by construction a tiny fraction of vertices).
    """
    return (
        edges.groupBy(F.col(key).alias("hub_key"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") > threshold)
    )


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salts) from the row's content
    (xxhash64 over ``cols``, default: all columns).  Deterministic → safe
    under task retries; content-derived → a hub key's rows spread uniformly.
    """
    cs = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cs), F.lit(n_salts)).cast("int"))


def two_phase_sum(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Exact salted aggregation: ``agg_cols`` maps output name -> input col,
    summed.  Phase 1 aggregates (keys, salt); phase 2 aggregates keys.

    Spark's hash aggregate already map-side-combines, so this matters when
    the *reduce* side of one key exceeds a single task (10^8+ rows per hub in
    a 10^12-edge graph) or when the aggregation is memory-bound per key.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(src).alias(out) for out, src in agg_cols.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(out).alias(out) for out in agg_cols]
    )


def salted_join(
    small: DataFrame,
    big: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """``small ⋈ big`` on ``key`` with the big side's hub rows spread over
    ``n_salts`` reducers.

    The small side is exploded ×n_salts (fine: it's small — a frontier, a
    dimension, a hub dictionary); the big side is salted from its full row
    content.  INNER ONLY: replication is equivalence-preserving just for
    inner joins — under ``left`` each small-row replica whose salt bucket
    matches no big rows would emit a spurious null-extended row, and under
    ``left_semi`` a key spanning several salts would duplicate small rows.
    For outer/semi semantics use the plain join (AQE skew splitting still
    applies) or dedup explicitly.
    """
    if how != "inner":
        raise ValueError(f"salted_join supports how='inner' only, got {how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts).withColumn("_salt", F.col("_salt").cast("int"))
    big_salted = with_salt(big, n_salts)
    out = small_rep.join(big_salted, [key, "_salt"], how)
    return out.drop("_salt")


def split_by_hubs(
    df: DataFrame, hubs: DataFrame, key: str
) -> tuple[DataFrame, DataFrame]:
    """(hub_rows, tail_rows) — route rows through the salted plan only when
    their key is a detected hub; the long tail takes the plain plan."""
    h = hubs.select(F.col("hub_key").alias(key))
    hub_rows = df.join(F.broadcast(h), key, "left_semi")
    tail_rows = df.join(F.broadcast(h), key, "left_anti")
    return hub_rows, tail_rows
