#!/usr/bin/env python
"""spark-submit entrypoint for the feature-matrix pipeline (north rule:
"run via spark-submit --py-files").

Usage (see scripts/run_submit.sh for packaging):
  spark-submit --py-files bgp_feature_extractor_spark.zip \
      scripts/submit_job.py --events <parquet_dir> --out <output_dir> \
      [--snapshot <parquet_dir>] [--minutes-window 1] [--format parquet|csv] \
      [--checkpoint <table_dir>]

The driver creates no SparkSession config of its own beyond defaults — all
tuning (shuffle partitions, AQE, memory) comes from spark-submit --conf, as
it would on a real cluster. With --checkpoint the run is resumable at
partition granularity (sources/checkpoint.py lineage table).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True, help="events table (parquet dir)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--snapshot", default=None, help="optional RIB snapshot table")
    ap.add_argument("--minutes-window", type=int, default=1)
    ap.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    ap.add_argument("--checkpoint", default=None, help="lineage/resume table dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bgp-feature-matrix").getOrCreate()

    from bgp_feature_extractor_spark.config import EngineConfig
    from bgp_feature_extractor_spark.plans.feature_matrix import (
        feature_matrix,
        to_reference_csv,
    )

    cfg = EngineConfig(minutes_window=args.minutes_window)
    events = spark.read.parquet(args.events)
    snapshot = spark.read.parquet(args.snapshot) if args.snapshot else None

    if args.checkpoint:
        # resumable run: feature matrix per source-bucket with lineage rows;
        # a restarted job recomputes only missing buckets
        from bgp_feature_extractor_spark.sources.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint)
        matrix = ckpt.run_stage(
            "feature_matrix",
            events,
            lambda subset: feature_matrix(subset, snapshot, cfg),
            key_col="source",
            buckets_per_job=8,
        )
    else:
        matrix = feature_matrix(events, snapshot, cfg)
    if args.format == "csv":
        to_reference_csv(matrix, args.out, cfg)
    else:
        matrix.write.mode("overwrite").parquet(args.out)


if __name__ == "__main__":
    main()
