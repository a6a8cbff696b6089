"""Table catalog abstraction: Iceberg when available, parquet directories
otherwise.

The north rule targets Iceberg catalogs at 10^12-file scale (ACID appends
for the metrics table, snapshot isolation for checkpoint reads, partition
pruning on ``superstep``); this sandbox ships no Iceberg runtime jar, so the
engine routes every table read/write through this module and picks the
format at runtime:

* ``iceberg_available(spark)`` — true iff the Iceberg Spark extension
  classes are on the JVM classpath.
* identifiers: ``catalog.db.table`` (Iceberg) vs filesystem paths (parquet).
  Callers pass a plain name + a root; this module maps it either way.

Cluster setup (documented, not testable here) — spark-submit with:

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=rest  (or hive/hadoop)
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

then ``TableCatalog(spark, root="lake.engine")`` writes Iceberg tables;
``TableCatalog(spark, root="/data/engine")`` writes parquet directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff Iceberg's Spark runtime is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableCatalog:
    """Uniform read/write/append over Iceberg tables or parquet dirs.

    ``root`` containing a ``/`` (or starting with a scheme) is treated as a
    filesystem root for parquet; otherwise it is an Iceberg namespace
    (``catalog.db``).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.is_path = "/" in root or root.startswith(("s3:", "gs:", "abfs:", "file:"))
        if not self.is_path and not iceberg_available(spark):
            raise ValueError(
                f"root {root!r} looks like an Iceberg namespace but no Iceberg "
                "runtime is on the classpath; pass a filesystem path for the "
                "parquet fallback"
            )

    def _ident(self, name: str) -> str:
        return f"{self.root}/{name}" if self.is_path else f"{self.root}.{name}"

    def read(self, name: str) -> DataFrame:
        if self.is_path:
            return self.spark.read.parquet(self._ident(name))
        return self.spark.read.format("iceberg").load(self._ident(name))

    def overwrite(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.is_path:
            w.parquet(self._ident(name))
        else:
            w.format("iceberg").saveAsTable(self._ident(name))

    def append(self, name: str, df: DataFrame) -> None:
        """Iceberg appends are ACID (safe under concurrent metric writers);
        the parquet fallback is append-by-new-files (safe for a single
        driver, the sandbox case)."""
        if self.is_path:
            df.write.mode("append").parquet(self._ident(name))
        else:
            df.write.format("iceberg").mode("append").saveAsTable(self._ident(name))

    def upsert(self, name: str, updates: DataFrame, key_cols: list[str]) -> None:
        """MERGE by key: rows matching on ``key_cols`` are replaced by the
        update row, everything else survives, new keys are inserted.

        Iceberg path: a real ``MERGE INTO`` (ACID, snapshot-isolated — the
        100 TB shape; only touched files rewrite).  Parquet fallback:
        anti-join survivors + union, staged to a temp dir and swapped in —
        correct for a single writer, documented as non-atomic on object
        stores (that is exactly what the Iceberg path exists for).
        ``updates`` must be unique per key (enforced — an ambiguous MERGE
        source is an error in every engine).
        """
        from pyspark.sql import functions as F

        dup = (
            updates.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
        )
        if not dup.isEmpty():
            raise ValueError(f"upsert updates contain duplicate keys on {key_cols}")

        ident = self._ident(name)
        if not self.is_path:
            updates.createOrReplaceTempView("_upsert_src")
            on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
            self.spark.sql(
                f"MERGE INTO {ident} t USING _upsert_src s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return

        existing = self.spark.read.parquet(ident)
        merged = existing.join(updates.select(*key_cols), key_cols, "left_anti").unionByName(
            updates
        )
        tmp = f"{ident}__upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(ident)
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = dst.getFileSystem(conf)
        fs.delete(dst, True)
        fs.rename(src, dst)
