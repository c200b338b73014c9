"""SparkSession factory tuned for the engine.

Local-mode defaults target the sandbox (local[32], 128 GiB); on a real
cluster every config here remains valid — shuffle partitions should be
raised to ~2-3x total cores and AQE re-coalesces at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bgp_feature_extractor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master[len("local[") : -1] if master.startswith("local[") else "32"
    n = os.cpu_count() or 32 if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Joins (guide §3.1/§9): allow shuffled-hash when a build side fits —
        # the matrix tail joins co-partitioned (source, bin) aggregates,
        # where sort-merge pays two wide-row sorts for nothing (measured
        # agg_full 6.5s -> 4.3s at 1M rows). AQE's threshold bounds the
        # build side per partition, and skew-join splitting still applies;
        # both values hold on a cluster (they are per-partition, not
        # per-host, and AQE re-coalesces partitions to the advisory size).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "256m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver heap IS the executor heap — size it for the
        # thread count (32 tasks x wide hash-agg state thrash an 8g heap)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
