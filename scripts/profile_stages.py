#!/usr/bin/env python
"""Per-stage wall-clock profile of the feature-matrix pipeline.

Usage: python scripts/profile_stages.py <cpus> [rows]
Each stage is warmed once, then timed with the noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.functions.editdist import with_edit_distance
from bgp_feature_extractor_spark.operators.aggregates import aggregate_bins
from bgp_feature_extractor_spark.operators.binning import (
    dense_spine,
    first_ts_per_source,
    with_bin,
)
from bgp_feature_extractor_spark.operators.rare import join_rare, rare_bin_aggregates_stream
from bgp_feature_extractor_spark.plans.feature_matrix import classify
from bgp_feature_extractor_spark.session import get_spark
from bgp_feature_extractor_spark.sources.synth import synth_events


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * int(cpus))
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/root/repo/.bench-cache")
    os.makedirs(cache, exist_ok=True)
    path = f"{cache}/bench_events_{rows}.parquet"
    if not os.path.isdir(path):
        synth_events(spark, rows).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)
    cfg = EngineConfig()

    def timed(name, df):
        force(df)
        t0 = time.perf_counter()
        force(df)
        print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)

    firsts = first_ts_per_source(ev).cache()
    cl = classify(ev, None, cfg)
    timed("classify", cl)
    binned = with_bin(cl, firsts, cfg)
    dist = with_edit_distance(binned, "tokens", "prev_tokens").drop("prev_tokens")
    timed("classify+bin+editdist", dist)
    raw_binned = with_bin(ev, firsts, cfg)
    timed("rare_stream(alone)", rare_bin_aggregates_stream(raw_binned, cfg))
    per_bin = join_rare(aggregate_bins(dist, cfg), rare_bin_aggregates_stream(raw_binned, cfg))
    timed("+agg+rare", per_bin)
    timed("+spine(full)", dense_spine(per_bin, firsts, cfg))


if __name__ == "__main__":
    main()
