"""Partition-pruned event layout (SURVEY §2.1 S1).

The reference discovers work by globbing per-day update files under a
collector directory (``bgpanomalies.py:51-64``: ``updates.YYYYMMDD.*``).
The table-native equivalent is a (source, day)-partitioned parquet layout:
``source=<collector>/day=<date>/part-*.parquet``. A query for one
collector-day then prunes at the FILE LISTING level — the scan's
``PartitionFilters`` eliminate every other directory before a single byte
of data is read. At 100 TB this is the single biggest scan lever: a
one-day-one-source query touches ~1/(sources*days) of the files.

``day`` is derived from the event timestamp at WRITE time so it is a pure
partition column (directory key, not stored per row).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_events(events: DataFrame, path: str) -> None:
    """Write the event stream as a (source, day)-partitioned table.

    At cluster scale add ``.option("maxRecordsPerFile", ...)`` or a
    pre-write ``repartition("source", "day")`` to bound file counts; for
    the bench layout the default task-per-partition write is fine."""
    (
        events.withColumn("day", F.to_date(F.timestamp_seconds(F.col("ts"))))
        .write.mode("overwrite")
        .partitionBy("source", "day")
        .parquet(path)
    )


def read_events_pruned(
    spark: SparkSession,
    path: str,
    sources: list[str] | None = None,
    start_day: str | _dt.date | None = None,
    end_day: str | _dt.date | None = None,
) -> DataFrame:
    """Read with partition predicates. Filters on ``source`` / ``day`` are
    directory-key predicates — Catalyst turns them into PartitionFilters
    (verified by tests/test_plan_quality.py), so unselected partitions are
    never listed, opened, or decoded."""
    df = spark.read.parquet(path)
    if sources:
        df = df.filter(F.col("source").isin(list(sources)))
    if start_day is not None:
        df = df.filter(F.col("day") >= F.lit(start_day).cast("date"))
    if end_day is not None:
        df = df.filter(F.col("day") <= F.lit(end_day).cast("date"))
    return df
