"""As-of join — each anchor row picks the latest reference row strictly
before it (per key), the temporal-enrichment primitive (market data,
event-context joins) the brief names among custom operators Spark lacks.

Spark-first formulation: ONE union + ONE window pass instead of a range
join.  Anchors and references are tagged and interleaved in (ts, tag)
order — references at the same timestamp sort AFTER anchors, so the
running ``last`` of reference timestamps seen at an anchor row is exactly
"greatest ref ts strictly < anchor ts" (DuckDB's ``ASOF JOIN … ON b.ts <
a.ts`` semantics, which the ``events_asof_prev`` contract query is gated
against).  Cost: one shuffle on the key + one sort — work scales with
per-key density and never explodes the way ``a.ts BETWEEN …`` range joins
can.

Skew (``ts_buckets``): a single window partition per key serializes a hot
key (10^8 rows of one key = one task).  ``ts_buckets=S`` splits each key's
timeline into S monotone time-range buckets and runs the SAME computation
in two parallel phases:

  1. local pass — the running last-ref window within each (key, bucket)
     partition (a hot key's rows spread over S tasks);
  2. carry pass — per (key, bucket) the max reference ts, then a running
     max over *strictly earlier* buckets (a window over ≤ S tiny rows per
     key), joined back on (key, bucket) — the exchange introduced by the
     local window already partitions rows that way.

``prev = greatest(local, carry)`` reproduces the single-window answer
exactly: refs in the same bucket are handled locally with the same
(ts, tag) strictness, and refs in earlier buckets have strictly smaller ts
(equal timestamps always share a bucket).  The default stays the
single-window plan — it is one shuffle cheaper when keys are well-behaved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_prev(
    anchors: DataFrame,
    refs: DataFrame,
    key_cols: list[str],
    ts_col: str,
    out_col: str = "prev_ts",
    *,
    ts_buckets: int | None = None,
) -> DataFrame:
    """Anchors + ``out_col`` = greatest ref ``ts_col`` strictly before the
    anchor's, per ``key_cols``; anchors with no earlier reference get null.

    ``ts_col`` must be orderable and identically typed on both sides
    (integer microseconds recommended — exact in every engine).
    ``ts_buckets=S`` enables the skew-safe two-phase plan (identical
    result); use it when one key can hold a large fraction of all rows.
    """
    payload = F.struct(*[F.col(c) for c in anchors.columns]).alias("_row")
    a = anchors.select(
        *key_cols, F.col(ts_col).alias("_ts"), F.lit(0).alias("_tag"), payload
    )
    r = refs.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(a.schema["_row"].dataType).alias("_row"),
    )
    rows = a.unionByName(r)

    if ts_buckets is None or ts_buckets <= 1:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("_ts", "_tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        prev = F.last(F.when(F.col("_tag") == 1, F.col("_ts")), ignorenulls=True).over(w)
        return (
            rows.withColumn(out_col, prev)
            .where(F.col("_tag") == 0)
            .select(F.col("_row.*"), F.col(out_col))
        )

    s = int(ts_buckets)
    lo, hi = rows.agg(F.min("_ts"), F.max("_ts")).first()
    if lo is None:
        return anchors.withColumn(out_col, F.lit(None).cast(a.schema["_ts"].dataType))
    span = max(int(hi) - int(lo) + 1, 1)
    # monotone in _ts: earlier bucket ⇒ strictly smaller _ts; equal _ts ⇒
    # same bucket (which is what keeps the strictly-before semantics local)
    rows = rows.withColumn(
        "_b", F.floor((F.col("_ts") - F.lit(int(lo))) * s / F.lit(span)).cast("int")
    )

    local_w = (
        Window.partitionBy(*key_cols, "_b")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_prev = F.last(
        F.when(F.col("_tag") == 1, F.col("_ts")), ignorenulls=True
    ).over(local_w)
    local = rows.withColumn("_local", local_prev)

    # carry: for every (key, bucket) PRESENT (refs or anchors — a bucket
    # with only anchors still inherits earlier refs), the max ref ts over
    # strictly earlier buckets; ≤ ts_buckets rows per key, so this window
    # is tiny no matter how hot the key is
    present = rows.select(*key_cols, "_b").distinct()
    ref_max = (
        rows.where(F.col("_tag") == 1)
        .groupBy(*key_cols, "_b")
        .agg(F.max("_ts").alias("_bmax"))
    )
    carry_w = (
        Window.partitionBy(*key_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        present.join(ref_max, [*key_cols, "_b"], "left")
        .withColumn("_carry", F.max("_bmax").over(carry_w))
        .select(*key_cols, "_b", "_carry")
    )

    # greatest() skips nulls, so either phase alone can supply the answer
    joined = local.join(carry, [*key_cols, "_b"], "left")
    return (
        joined.withColumn(out_col, F.greatest(F.col("_local"), F.col("_carry")))
        .where(F.col("_tag") == 0)
        .select(F.col("_row.*"), F.col(out_col))
    )
