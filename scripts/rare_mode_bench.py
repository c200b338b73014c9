#!/usr/bin/env python
"""Controlled rare-mode comparison: feature_matrix wall-clock per
rare_mode at one core count. Usage:

    python scripts/rare_mode_bench.py <cpus> <rows> <hot_pct> [rounds] [modes]

Emits one JSON line {"cpus":..,"modes":{mode:{"whole":s,"rare_alone":s}}}
and appends to .bench-cache/rare_mode_runs.jsonl. Run at 4 then 16 cores
in a quiet window to attribute the scaling gap to the rare stage's wave
quantization (20 source-partitions vs 16 cores = 2 waves, 12 idle slots).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.operators.binning import first_ts_per_source, with_bin
from bgp_feature_extractor_spark.operators.asof import EVENT_COLS
from bgp_feature_extractor_spark.operators.rare import (
    rare_bin_aggregates_block,
    rare_bin_aggregates_dist,
    rare_bin_aggregates_stream,
)
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.session import get_spark
from bgp_feature_extractor_spark.sources.synth import synth_events

RARE_FNS = {
    "exact": rare_bin_aggregates_stream,
    "dist": rare_bin_aggregates_dist,
    "block": rare_bin_aggregates_block,
}


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(sys.argv[1])
    rows = int(sys.argv[2])
    hot = int(sys.argv[3])
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    modes = sys.argv[5].split(",") if len(sys.argv) > 5 else ["exact", "dist", "block"]
    n_sources = int(sys.argv[6]) if len(sys.argv) > 6 else 20
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/root/repo/.bench-cache")
    suffix = "" if hot == 40 else f"_hot{hot}"
    if n_sources != 20:
        suffix += f"_s{n_sources}"
    path = f"{cache}/bench_events_{rows}{suffix}.parquet"
    if not os.path.isdir(path):
        synth_events(spark, rows, hot_pct=hot, n_sources=n_sources).write.mode(
            "overwrite"
        ).parquet(path)
    ev = spark.read.parquet(path)

    out = {}
    for mode in modes:
        cfg = EngineConfig(rare_mode=mode)
        firsts = first_ts_per_source(ev).cache()
        raw_binned = with_bin(ev.select(*EVENT_COLS), firsts, cfg)
        rec = {}
        for name, df_fn in (
            ("rare_alone", lambda: RARE_FNS[mode](raw_binned, cfg)),
            ("whole", lambda: feature_matrix(ev, None, cfg)),
        ):
            df = df_fn()
            force(df)  # warm
            ts = []
            for _ in range(rounds):
                t0 = time.perf_counter()
                force(df)
                ts.append(time.perf_counter() - t0)
            rec[name] = round(min(ts), 2)
            print(
                f"cpus={cpus} mode={mode} {name}: {rec[name]}s "
                f"load={open('/proc/loadavg').read().split()[0]}",
                file=sys.stderr,
                flush=True,
            )
        firsts.unpersist()
        out[mode] = rec
        # append per-mode so a timeout never loses completed measurements
        line = json.dumps(
            {
                "cpus": cpus,
                "rows": rows,
                "hot_pct": hot,
                "n_sources": n_sources,
                "rounds": rounds,
                "mode": mode,
                **rec,
                "load": float(open("/proc/loadavg").read().split()[0]),
            }
        )
        print(line, flush=True)
        with open(f"{cache}/rare_mode_runs.jsonl", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
