"""Sessionization — batch window-function form + custom STATEFUL streaming
operator (``applyInPandasWithState``).

Two implementations of the same semantics (events of one user belong to one
session while consecutive gaps stay ≤ ``gap``):

* ``sessionize_batch`` — pure window functions (lag → new-session flag →
  running sum), fully SQL-expressible, so the driver's DuckDB oracle gates
  it digit-for-digit (contract query ``user_sessions``).
* ``sessionize_stream`` — the Structured-Streaming form with per-user
  session state carried across micro-batches in ``GroupState``: closed
  sessions are emitted as rows, the open tail session lives in the state
  store.  This is the engine's "custom stateful operator" surface — the
  shape a 100 TB pipeline uses for stateful enrichment that windowed
  aggregations can't express.

Timestamps are compared as ``unix_micros`` longs in both forms (and as
``epoch_us`` in the oracle) — integer microseconds are exact in every
engine, so no float-time drift between the three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN_DEFAULT = 30

_SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, start_us long, end_us long"
)
# open-session state carried between micro-batches, per user
_SESSION_STATE_SCHEMA = "session_seq long, n_events long, start_us long, last_us long"


def sessionize_batch(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN_DEFAULT
) -> DataFrame:
    """(user_id, session_seq, n_events, start_us, end_us) per session.

    ROWS frame + (ts, event_id) ordering everywhere: event_id breaks
    timestamp ties, making the running session counter deterministic (the
    default RANGE frame would merge tied rows differently than the oracle).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # parquet fixtures carry TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast is offset-free and unix_micros == epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(order)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return (
        events.withColumn("_us", us)
        .withColumn("_new", is_new)
        .withColumn("session_seq", F.sum("_new").over(running))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
        )
    )


def sessionize_batch_sql(gap_minutes: int = SESSION_GAP_MIN_DEFAULT) -> str:
    """The ANSI-SQL twin of ``sessionize_batch`` (DuckDB dialect)."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
        WITH ordered AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events),
        flagged AS (
            SELECT user_id, event_id, us,
                   CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us}
                        THEN 1 ELSE 0 END AS is_new
            FROM ordered),
        sess AS (
            SELECT user_id, us,
                   -- ::BIGINT: DuckDB's sum() yields HUGEINT, which lands in
                   -- pandas as float and breaks the exact value compare
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS session_seq
            FROM flagged)
        SELECT user_id, session_seq, count(*) AS n_events,
               min(us) AS start_us, max(us) AS end_us
        FROM sess GROUP BY user_id, session_seq
    """


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN_DEFAULT,
    *,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization over a (possibly unbounded) event stream.

    Per-user ``GroupState`` holds the open session; each micro-batch sorts
    its rows by (ts, event_id), closes sessions whose gap exceeds the
    threshold, emits them, and stores the open tail.  Rows arriving across
    micro-batches continue the stored session.  Note: like any event-time
    stateful operator, correctness relies on per-key batch-order delivery
    (file streams deliver in file order).

    Idle sessions FLUSH: each update arms an event-time timeout at
    ``last event + gap``, so once the watermark (max event time seen minus
    ``watermark_delay``) passes a user's idle deadline, the open session is
    emitted and its buffer cleared — an idle user's last session no longer
    sits in the state store forever.  A (seq, 0, 0, 0) counter row is kept
    per user after a flush so a later event continues the per-user session
    numbering exactly like the batch twin (the counter is a few bytes per
    user — the event buffer itself is always released).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def fn(key, pdfs, state):
        (user_id,) = key

        if state.hasTimedOut:
            # watermark passed last_us + gap: the open session is definitively
            # closed (any still-admissible row would be late beyond the gap)
            seq, n, start_us, last_us = state.get
            if n > 0:
                state.update((seq, 0, 0, 0))  # keep the seq counter only
                yield pd.DataFrame(
                    [(user_id, seq, n, start_us, last_us)],
                    columns=["user_id", "session_seq", "n_events", "start_us", "end_us"],
                )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_us"] = rows["ts"].astype("int64") // 1000  # ns → µs
        rows = rows.sort_values(["_us", "event_id"], kind="mergesort")

        if state.exists:
            seq, n, start_us, last_us = state.get
            if n == 0:  # counter-only state left by a timeout flush
                start_us, last_us = None, None
        else:
            seq, n, start_us, last_us = 0, 0, None, None

        closed = []
        for us in rows["_us"].to_list():
            if start_us is None:
                seq, n, start_us, last_us = seq + 1, 1, us, us
            elif us - last_us > gap_us:
                closed.append((user_id, seq, n, start_us, last_us))
                seq, n, start_us, last_us = seq + 1, 1, us, us
            else:
                n, last_us = n + 1, us
        state.update((seq, n, start_us, last_us))
        # EventTimeTimeout requires a deadline strictly beyond the current
        # watermark — one key whose newest event is already older than
        # watermark − gap would otherwise throw IllegalArgumentException and
        # kill the whole query.  Clamp: the session then flushes on the very
        # next trigger, which is also the earliest semantically valid time.
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_seq", "n_events", "start_us", "end_us"],
            )

    if events.isStreaming:
        events = events.withWatermark("ts", watermark_delay)
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        _SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
