"""Streaming graph ingest — watermarked windowed degree / hot-vertex
detection over an EDGE stream.

The streaming × graph intersection: a crawler emits timestamped edges
continuously, and operations (crawl rate-limiting, link-spam alarms,
freshness dashboards) need per-window vertex degree and the set of
vertices whose in-window degree crosses a threshold — BEFORE any batch
kernel runs.  This is the standard first stage of keeping a 100 TB link
graph fresh: the stream maintains the hot set; the batch kernels
(pagerank warm-start, incremental components) consume its output.

Batch/stream parity, the module family's invariant: the transformation is
ONE function over a DataFrame, run identically on a batch frame (the
oracle-gateable twin) and on a watermarked ``readStream`` (bounded state:
the watermark closes windows, so per-window degree state is
|window| × |active vertices|, never the full history).  Both endpoints of
an edge count (the undirected-degree convention every batch kernel uses);
a directed variant is one ``unpivot`` removal away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, ts timestamp"


def windowed_degrees(
    edges: DataFrame, window: str = "1 hour", slide: str | None = None
) -> DataFrame:
    """(window_start, window_end, vertex, degree): per-event-time-window
    undirected degree — identical on a batch frame and a watermarked
    stream (a pure groupBy on (window, vertex), so Structured Streaming
    runs it with watermark-bounded state and map-side partial aggregation
    on both unpivoted halves)."""
    both = edges.select(F.col("src").alias("vertex"), "ts").unionByName(
        edges.select(F.col("dst").alias("vertex"), "ts")
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        both.groupBy(w.alias("win"), "vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "vertex",
            "degree",
        )
    )


def hot_vertices(
    edges: DataFrame,
    threshold: int,
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """``windowed_degrees`` filtered to degree ≥ threshold — the hot set.
    The filter sits ABOVE the aggregation, so streaming state is identical
    to ``windowed_degrees``'s; emission happens when the watermark closes
    a window (append mode)."""
    return windowed_degrees(edges, window, slide).where(
        F.col("degree") >= threshold
    )


def read_edge_stream(
    spark: SparkSession, path: str, watermark: str = "1 hour"
) -> DataFrame:
    """File-source stream of (src, dst, ts) parquet with an event-time
    watermark bounding the windowed-degree state."""
    return (
        spark.readStream.schema(EDGE_STREAM_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


def run_hot_vertices_once(
    spark: SparkSession,
    src_path: str,
    sink_path: str,
    checkpoint: str,
    threshold: int,
    window: str = "1 hour",
) -> None:
    """One availableNow pass: edge stream → hot vertices → parquet sink
    (append mode — rows emit as the watermark closes each window)."""
    q = (
        hot_vertices(read_edge_stream(spark, src_path), threshold, window)
        .writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
