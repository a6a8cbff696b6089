"""Streaming corpus curation — the Gopher-style selection pipeline
(language ∧ quality ∧ repetition thresholds → exact dedup) applied to a
DOCUMENT STREAM, so a 100 TB/day ingest is filtered as it lands instead of
by nightly batch re-runs.

Everything before the dedup is STATELESS per document, so it runs in any
streaming mode with zero state: the repetition signals are recomputed here
as pure column expressions (array HOFs over the in-plan token array — no
groupBy, which an append-mode stream could not run unwindowed).  They
implement the SAME definitions as ``operators.features.repetition_stats``
(that form is the batch/aggregation shape; this is the per-row shape — the
equivalence is pytest-checked), at O(distinct-grams × grams) per document,
all whole-stage codegen.

The only stateful stage is the terminal first-occurrence dedup
(``streaming.dedup.stream_exact_dedup`` — watermark-bounded fingerprint
state).  On a BATCH input the same function composes the identical filters
with the earliest-occurrence batch dedup, so stream and batch are testable
against each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.functions.text import lang_id, quality_score
from parallel_betweenness_centrality_using_bsp_spark.streaming.dedup import stream_exact_dedup


def _toks(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(F.trim(text_col)), F.lit(r"\S+"), 0)


def _grams(t: str, n: int) -> str:
    """SQL snippet: the adjacent n-gram array of token array ``t``."""
    joined = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(n))
    return f"transform(sequence(0, size({t}) - {n}), i -> {joined})"


def repetition_cols(text_col: Column) -> dict[str, Column]:
    """{n_tokens, distinct_ratio, top_bigram_frac, dup_trigram_frac} as
    PURE column expressions (no aggregation) — the streaming-safe twin of
    ``features.repetition_stats``; identical values by construction
    (multiset counts of the same grams over the same tokens)."""
    t = _toks(text_col)
    nt = F.size(t).cast("double")
    bg, tg = _grams("_t", 2), _grams("_t", 3)
    top_bg = F.expr(
        f"""CASE WHEN size(_t) < 2 THEN 0 ELSE
            array_max(transform(array_distinct({bg}),
                      x -> size(filter({bg}, y -> y = x)))) END"""
    )
    dup_tg = F.expr(
        f"""CASE WHEN size(_t) < 3 THEN 0 ELSE
            aggregate(transform(array_distinct({tg}),
                      x -> size(filter({tg}, y -> y = x))),
                      0, (acc, c) -> acc + CASE WHEN c >= 2 THEN c ELSE 0 END)
            END"""
    )
    return {
        "_t": t,  # caller materializes once; the expressions reference it
        "n_tokens": F.size(F.col("_t")),
        "distinct_ratio": F.size(F.array_distinct(F.col("_t"))) / nt,
        "top_bigram_frac": F.least(F.lit(1.0), top_bg * 2 / nt),
        "dup_trigram_frac": F.least(F.lit(1.0), dup_tg * 3 / nt),
    }


def curate_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_top_bigram: float = 0.5,
    max_dup_trigram: float = 0.2,
    watermark: str = "1 hour",
) -> DataFrame:
    """Filtered, deduplicated curation stream (works on batch inputs too —
    identical filters, earliest-occurrence dedup).  Returns the surviving
    rows of ``docs`` plus the ``fp`` fingerprint column."""
    cols = repetition_cols(F.col(text_col))
    staged = docs.withColumn("_t", cols["_t"])
    kept = staged.where(
        (F.size(F.col("_t")) >= min_tokens)
        & (cols["top_bigram_frac"] <= max_top_bigram)
        & (cols["dup_trigram_frac"] <= max_dup_trigram)
        & (lang_id(F.col(text_col)) == lang)
        & (quality_score(F.col(text_col)) >= min_quality)
    ).drop("_t")
    return stream_exact_dedup(
        kept, text_col=text_col, ts_col=ts_col, id_col=id_col, watermark=watermark
    )
