#!/usr/bin/env python
"""Measure the per-execution DRIVER constant of the scaling-bench job.

The scaling bench times repeated `noop` writes of ONE pre-built
feature_matrix DataFrame. Analysis (~1.3s) is paid once at build, but each
write action still re-runs Catalyst optimization + physical planning of
the full multi-branch plan, plus AQE's between-stage driver re-planning.
That driver time is identical at local[4] and local[16]; a constant c on
both sides moves measured efficiency (S4 - c) / (4 * (S16 - c)) -> lower
than the engine's true scaling, so quantifying it tells us how much of the
0.78-vs-0.80 gap is driver constant rather than executor scaling.

Probes (one JSON line each):
  1. optimize+physical planning time of a freshly-built identical plan
     (direct py4j timing of optimizedPlan()/executedPlan()).
  2. repeated noop writes of the real 8M-row job (context timing).
  3. repeated noop writes of the SAME plan over a zero-row input with the
     same schema -- execution ~0, so the floor is planning + job/stage
     launch overhead; also run with AQE off for the AQE share.

Usage: python scripts/probe_overhead.py [cpus] [rows] [hot] [sources] [tscale]
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
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
HOT = int(sys.argv[3]) if len(sys.argv) > 3 else 5
NSRC = int(sys.argv[4]) if len(sys.argv) > 4 else 128
TSC = int(sys.argv[5]) if len(sys.argv) > 5 else 100


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = f"{repo}/.bench-cache/bench_events_{ROWS}_hot{HOT}_s{NSRC}_t{TSC}.parquet"
    ev = spark.read.parquet(path)
    cfg = EngineConfig()
    out = {"cpus": CPUS, "rows": ROWS}

    # -- probe 1: direct planning time (fresh plan, warm JVM) ------------
    m = feature_matrix(ev, None, cfg)
    force(m)  # warm: codegen caches, stats, broadcast
    t = []
    for _ in range(3):
        m2 = feature_matrix(ev, None, cfg)
        jqe = m2._jdf.queryExecution()
        t0 = time.perf_counter()
        jqe.optimizedPlan()
        t1 = time.perf_counter()
        jqe.executedPlan()
        t2 = time.perf_counter()
        t.append((round(t1 - t0, 3), round(t2 - t1, 3)))
    out["optimize_s,physical_s"] = t

    # -- probe 2: real executions (context; absolute values are load-
    #    sensitive, the EMPTY floor below is what matters) ---------------
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(m)
        runs.append(round(time.perf_counter() - t0, 3))
    out["real_exec_s"] = runs
    out["loadavg"] = round(os.getloadavg()[0], 2)

    # -- probe 3: zero-row twin -> planning + launch floor ---------------
    empty = spark.createDataFrame([], ev.schema)
    m0 = feature_matrix(empty, None, cfg)
    force(m0)  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(m0)
        runs.append(round(time.perf_counter() - t0, 3))
    out["empty_exec_s"] = runs

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    force(m0)
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(m0)
        runs.append(round(time.perf_counter() - t0, 3))
    out["empty_exec_noaqe_s"] = runs
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
