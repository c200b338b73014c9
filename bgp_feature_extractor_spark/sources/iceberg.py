"""Iceberg table IO with graceful parquet degradation.

The north rule targets Iceberg tables of pre-tokenized sequences; this
image ships no Iceberg runtime jar, so every writer/reader here probes for
the extension and falls back to a plain parquet directory with the same
logical layout (partition columns become directory partitions). On a real
cluster with `iceberg-spark-runtime` on the classpath and a catalog
configured, the same calls produce Iceberg tables with hidden-partition
specs and snapshot isolation — nothing else in the engine changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension classes are on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write to an Iceberg table (``catalog.db.table`` target) when the
    runtime is present, else a partitioned parquet directory (path target).
    Returns the storage kind actually used ('iceberg' | 'parquet')."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        writer = df.writeTo(target).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read an Iceberg table name or a parquet path, whichever `target` is."""
    if iceberg_available(spark) and "/" not in target:
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)
