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
can.  Skew note: a single hot key serializes into one window task; salt or
pre-aggregate references per (key, ts) if a key holds a large fraction of
all rows.
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
) -> DataFrame:
    """Anchors + ``out_col`` = greatest ref ``ts_col`` strictly before the
    anchor's, per ``key_cols``; anchors with no earlier reference get null.

    ``ts_col`` must be orderable and identically typed on both sides
    (integer microseconds recommended — exact in every engine).
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
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.last(F.when(F.col("_tag") == 1, F.col("_ts")), ignorenulls=True).over(w)
    return (
        a.unionByName(r)
        .withColumn(out_col, prev)
        .where(F.col("_tag") == 0)
        .select(F.col("_row.*"), F.col(out_col))
    )
