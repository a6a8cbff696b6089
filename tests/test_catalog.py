import pytest
from pyspark.sql import functions as F

from parallel_betweenness_centrality_using_bsp_spark.sources.catalog import (
    TableCatalog,
    iceberg_available,
)


def test_parquet_fallback_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "lake"))
    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    cat.overwrite("t1", df)
    assert cat.read("t1").count() == 10
    cat.append("t1", df)
    assert cat.read("t1").count() == 20


def test_partitioned_overwrite(spark, tmp_path):
    import os

    cat = TableCatalog(spark, str(tmp_path / "lake"))
    df = spark.range(20).select("id", (F.col("id") % 4).alias("superstep"))
    cat.overwrite("state", df, partition_by=["superstep"])
    parts = [d for d in os.listdir(tmp_path / "lake" / "state") if d.startswith("superstep=")]
    assert len(parts) == 4
    assert cat.read("state").count() == 20


def test_iceberg_namespace_requires_runtime(spark):
    # This sandbox has no Iceberg jar: namespace roots must fail loudly
    # instead of writing to a bogus location.
    assert not iceberg_available(spark)
    with pytest.raises(ValueError, match="Iceberg"):
        TableCatalog(spark, "lake.engine")


def test_parquet_upsert_merges_by_key(spark, tmp_path):
    from parallel_betweenness_centrality_using_bsp_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    cat.overwrite("docs", base)
    updates = spark.createDataFrame(
        [(2, "B2", 200), (4, "d", 40)], "id long, name string, v long"
    )
    cat.upsert("docs", updates, ["id"])
    got = sorted(map(tuple, cat.read("docs").collect()))
    assert got == [(1, "a", 10), (2, "B2", 200), (3, "c", 30), (4, "d", 40)]


def test_parquet_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    import pytest

    from parallel_betweenness_centrality_using_bsp_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path))
    cat.overwrite("t", spark.createDataFrame([(1, "x")], "id long, s string"))
    dup = spark.createDataFrame([(1, "y"), (1, "z")], "id long, s string")
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.upsert("t", dup, ["id"])
