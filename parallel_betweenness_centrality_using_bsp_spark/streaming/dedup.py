"""Streaming exact deduplication — keeping a dedup index fresh as new
documents arrive, instead of re-running batch dedup over the full corpus.

Two variants over a document stream (doc_id, ts, text):

* ``stream_exact_dedup`` — emit only the FIRST occurrence of each
  normalization fingerprint (sha256 of lowercased, whitespace-collapsed
  text — the same key batch ``exact_dedup`` uses), with
  ``dropDuplicatesWithinWatermark``: state per fingerprint is retained
  only within the event-time watermark, so state size is bounded by the
  dedup horizon instead of growing with the corpus.
* an unbounded-state variant is just ``dropDuplicates(["fp"])`` — exact
  forever, state grows with distinct fingerprints; the watermarked form is
  the 100 TB-stream shape.

The emitted stream is append-only and composes with the batch operators:
write it to the documents table and the batch pipeline never sees the
dropped duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.text import fingerprint


def stream_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per fingerprint within the watermark horizon.

    ``docs`` may be a stream (``readStream``) or a batch DataFrame — on a
    batch input the EARLIEST (ts, id) row per fingerprint is kept, matching
    the stream's first-occurrence semantics (a bare ``dropDuplicates``
    would keep an arbitrary row, so batch and stream could disagree on
    which doc survives), so the same transform is testable both ways.
    """
    with_fp = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if with_fp.isStreaming:
        with_fp = with_fp.withWatermark(ts_col, watermark)
        return with_fp.dropDuplicatesWithinWatermark(["fp"])
    w = Window.partitionBy("fp").orderBy(ts_col, id_col)
    return (
        with_fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
