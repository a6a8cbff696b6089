"""Multi-format table IO — CSV / JSON-lines / ORC / parquet behind one
router (SURVEY.md §2 Table B, file-format scans).

``read_table`` dispatches on an explicit ``fmt`` or the path's extension.
Scale rules baked in rather than left to callers:

  * CSV and JSON get an EXPLICIT schema when the caller has one —
    ``inferSchema``/sampling reads the data twice and can flip types
    between runs; at 100 TB schema inference is a second full scan.
    Without a schema we still do a single-pass read (``samplingRatio``
    stays at Spark's default only for the JSON header probe).
  * CSV is splittable only when uncompressed or bgzip'd — the reader
    doesn't change that, but ``mode="FAILFAST"`` surfaces corrupt rows
    loudly instead of silently nulling columns mid-corpus.
  * Parquet/ORC pass through to the native vectorized readers (predicate
    pushdown + column pruning preserved; nothing wrapped).

``write_table`` mirrors the same formats for round-trips and exports;
parquet stays the default interchange format everywhere else in the repo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FMT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


def _detect(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt.lower()
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    raise ValueError(
        f"cannot detect format from {path!r}; pass fmt= one of "
        f"{sorted(set(_EXT_FMT.values()))}"
    )


def _sep(path: str, delimiter: str | None) -> str:
    """Delimiter precedence: an EXPLICITLY passed ``delimiter`` always wins;
    otherwise '.tsv' paths default to tab and everything else to comma."""
    if delimiter is not None:
        return delimiter
    return "\t" if path.rstrip("/").endswith(".tsv") else ","


def read_table(
    spark: SparkSession,
    path: str,
    *,
    fmt: str | None = None,
    schema: str | None = None,
    header: bool = True,
    delimiter: str | None = None,
) -> DataFrame:
    """Read ``path`` as a DataFrame; ``schema`` is a DDL string (strongly
    recommended for csv/json — skips inference's extra pass).  ``delimiter``
    defaults per :func:`_sep` (tab for '.tsv', else comma); passing it
    explicitly overrides the extension default."""
    f = _detect(path, fmt)
    if f == "parquet":
        return spark.read.parquet(path)
    if f == "orc":
        return spark.read.orc(path)
    if f == "csv":
        r = spark.read.option("header", str(header).lower()).option(
            "sep", _sep(path, delimiter)
        ).option("mode", "FAILFAST")
        return (r.schema(schema) if schema else r.option("inferSchema", "true")).csv(
            path
        )
    if f == "json":
        r = spark.read.option("mode", "FAILFAST")
        return (r.schema(schema) if schema else r).json(path)
    raise ValueError(f"unsupported format {f!r}")


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str | None = None,
    header: bool = True,
    delimiter: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` to ``path`` in the detected/explicit format
    (mode=overwrite; ``partition_by`` for the columnar formats).
    ``delimiter`` precedence matches :func:`read_table`."""
    f = _detect(path, fmt)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if f == "parquet":
        w.parquet(path)
    elif f == "orc":
        w.orc(path)
    elif f == "csv":
        w.option("header", str(header).lower()).option(
            "sep", _sep(path, delimiter)
        ).csv(path)
    elif f == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported format {f!r}")
