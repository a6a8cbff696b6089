"""Event funnel analysis — ordered-stage conversion counting.

The standard product-analytics primitive: given an ordered list of stages
(event types), count the users who completed stages 1..i IN ORDER — each
stage's event strictly AFTER the user's earliest completion of the
previous stage (the "earliest-completion" funnel: t₁ = min ts of stage 1,
tᵢ = min ts of a stage-i event with ts > tᵢ₋₁).  Strict ``>`` makes
simultaneous events unambiguous and the result engine-portable.

Per stage: one filtered scan + one user-keyed join + one min aggregation
— user_id-keyed hash ops end to end, so the plan is one shuffle per stage
regardless of corpus size, and a power user's events stay inside their
own aggregation group.  The stage list is a tiny driver-side constant
(the loop unrolls the PLAN, it moves no data — same as the unrolled
superstep twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(stage int, event_type string, users long): one row per stage, users
    = how many users reached it in order.  ``users`` is non-increasing in
    ``stage`` by construction."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    rows: list[DataFrame] = []
    cur: DataFrame | None = None
    for i, s in enumerate(stages, start=1):
        ev = events.where(F.col(type_col) == s).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("ts")
        )
        if cur is None:
            cur = ev.groupBy("user").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(cur.select("user", F.col("t").alias("_pt")), "user")
                .where(F.col("ts") > F.col("_pt"))
                .groupBy("user")
                .agg(F.min("ts").alias("t"))
            )
        rows.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).alias("stage"), F.lit(s).alias("event_type"), "users"
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
