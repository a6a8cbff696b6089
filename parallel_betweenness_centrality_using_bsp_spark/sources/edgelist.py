"""Edge-list text source/sink (SURVEY.md §2 Table A, A1).

The reference's input format is a plain text edge list (one ``src dst`` pair
per line, optional comment lines).  This reader is pure column expressions
over ``spark.read.text`` — regexp split + casts, all JVM-side — so a 100 TB
edge list splits across executors like any other text scan; no driver
parsing, no Python.

Accepted line shapes:
  ``7 42``        whitespace/tab separated pair (extra columns ignored)
  ``# comment``   lines starting with # or % are skipped
  ``7,42``        with ``delimiter=","``

Non-numeric ids: pass ``numeric=False`` to get (src_key, dst_key) strings
and run ``densify_vertices`` (operators/edges.py) for dense longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edgelist(
    spark: SparkSession,
    path: str,
    *,
    delimiter: str | None = None,
    numeric: bool = True,
) -> DataFrame:
    """(src long, dst long) — or (src_key, dst_key) strings if numeric=False."""
    sep = delimiter if delimiter is not None else r"[\s,;]+"
    lines = spark.read.text(path)
    parts = (
        lines.where(
            (F.length(F.trim("value")) > 0)
            & ~F.trim("value").startswith("#")
            & ~F.trim("value").startswith("%")
        )
        .select(F.split(F.trim("value"), sep).alias("p"))
        .where(F.size("p") >= 2)
        .select(F.col("p")[0].alias("a"), F.col("p")[1].alias("b"))
    )
    if not numeric:
        return parts.select(
            F.col("a").alias("src_key"), F.col("b").alias("dst_key")
        )
    return (
        # try_cast: malformed lines become NULL and are dropped (ANSI mode
        # makes a plain cast throw on the first bad token).
        parts.select(
            F.col("a").try_cast("long").alias("src"),
            F.col("b").try_cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def write_edgelist(edges: DataFrame, path: str, *, delimiter: str = " ") -> None:
    """Write (src, dst) back out as delimiter-separated text."""
    edges.select(
        F.concat_ws(delimiter, F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)
