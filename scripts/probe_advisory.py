#!/usr/bin/env python
"""Interleaved A/B of AQE coalescing granularity on the headline job.

Event-log profiling (round 4) showed the 16-core tail of the classify->
editdist->partial-agg stage is an AQE artifact: with the default 64MB
advisoryPartitionSizeInBytes, AQE merges pairs of ~30MB shuffle
partitions into ~2x-sized tasks (32 -> 30 on the classify exchange,
32 -> 24 on the final spine stage), and those double tasks run as a
1-3-core straggler tail for the last ~2s of the stage. A 16MB advisory
keeps the fine partitions: 32 uniform tasks = two even waves at 16
cores. This probe interleaves the two configs (runtime SQLConf, same
session, same warmed plan) and reports per-config minima — meant to run
inside quiet windows via the scaling watch.

Usage: python scripts/probe_advisory.py [cpus] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.session import get_spark

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

CONFS = {
    "A_adv64m": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    },
    "B_adv16m": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    },
    # C: keep AQE (skew-join, empty-relation propagation) but do not let it
    # coalesce below the engine's explicit 2x-cores shuffle sizing. The r3
    # "disable AQE" rejection conflated coalescing with AQE's other wins
    # (full AQE-off cost ~2s of bare stage launches on the empty-relation
    # path at 4c); this arm separates them.
    "C_coalesce_off": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
    # D: advisory just above the measured ~30MB shuffle-partition size.
    # Merging any two partitions would exceed it, so the headline job
    # keeps its 32 even tasks (same as C), but coalescing stays ON for
    # stages that genuinely produce tiny partitions (selective filters,
    # the rare branch's per-source frames). If D ~= C and both beat A,
    # the straggler tail is the pair-merge and D is the adoptable
    # default; if B < D the win would be something other than merge
    # avoidance and needs re-profiling.
    "D_adv32m": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    },
}


def main():
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ev = spark.read.parquet(
        f"{repo}/.bench-cache/bench_events_8000000_hot5_s128_t100.parquet"
    )
    m = feature_matrix(ev, None, EngineConfig())

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(m)  # warm
    res = {k: [] for k in CONFS}
    loads = []
    for _ in range(ROUNDS):
        for k, conf in CONFS.items():
            for kk, vv in conf.items():
                spark.conf.set(kk, vv)
            t0 = time.perf_counter()
            force(m)
            res[k].append(round(time.perf_counter() - t0, 2))
            loads.append(round(os.getloadavg()[0], 2))
    out = {"cpus": CPUS, "rounds": ROUNDS, "loads": loads}
    for k, v in res.items():
        out[k] = {"min": min(v), "all": v}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
