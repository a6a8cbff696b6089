"""Structured-Streaming ingest for the events table shape.

The reference is a batch BSP kernel with no streaming semantics (SURVEY.md
§2 Table B), so streaming is a SUPPORT surface here: the transformations are
defined once as batch-compatible DataFrame functions and wired to
``readStream``/``writeStream`` so the same logic runs over a file stream
with watermarked event-time windows — the pattern a 100 TB pipeline uses to
keep link graphs and dedup indexes fresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", slide: str | None = None
) -> DataFrame:
    """Tumbling/sliding event-time window counts per event_type — works
    identically on a batch DataFrame and a watermarked stream."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def read_events_stream(
    spark: SparkSession, path: str, watermark: str = "1 hour"
) -> DataFrame:
    """File-source stream of events parquet with an event-time watermark
    (bounds state for the windowed aggregations under late data)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


def run_windowed_counts_once(
    spark: SparkSession, src_path: str, sink_path: str, checkpoint: str,
    window: str = "1 hour",
) -> None:
    """One availableNow pass: stream src → windowed counts → parquet sink.
    Exactly-once via the streaming checkpoint; rerunning picks up only new
    files — the incremental-ingest pattern."""
    stream = read_events_stream(spark, src_path)
    q = (
        windowed_event_counts(stream, window)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start(sink_path)
    )
    q.awaitTermination()
