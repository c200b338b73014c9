#!/usr/bin/env python
"""North-rule scaling evidence: identical feature-matrix job at N and 4N
local cores on the same input; reports throughput at both + efficiency.
Usage: python scripts/scaling_bench.py [rows] [N] — runs local[N] then
local[4N] in separate JVMs (sequential; idle machine required). Default
N=4: this sandbox exposes 32 hyperthreads but only ~16 cores of real
compute (measured via a pure-CPU burn: 8->32 procs gives 2x, 4->16 gives
3.55x), so 4->16 is the honest N->4N pair."""
import json
import os
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4
RUNNER = r'''
import sys, time, os
sys.path.insert(0, "%(repo)s")
from bgp_feature_extractor_spark.session import get_spark
from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix
from bgp_feature_extractor_spark.sources.synth import synth_events
from bgp_feature_extractor_spark.config import EngineConfig
cpus = int(sys.argv[1]); rows = int(sys.argv[2])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2*cpus)
path = f"%(repo)s/.bench-cache/bench_events_{rows}.parquet"
if not os.path.isdir(path):
    synth_events(spark, rows).write.mode("overwrite").parquet(path)
ev = spark.read.parquet(path)
def force(df): df.write.format("noop").mode("overwrite").save()
cfg = EngineConfig()
force(feature_matrix(ev, None, cfg))  # warm
ts = []
for _ in range(3):
    t0 = time.perf_counter(); force(feature_matrix(ev, None, cfg)); ts.append(time.perf_counter() - t0)
ts.sort()
print(f"RESULT {cpus} {ts[1]:.3f}")
'''


def run(cpus: int) -> float:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = RUNNER % {"repo": repo}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(ROWS)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[2])
    raise RuntimeError(out.stderr[-2000:])


def main():
    tn = run(N)
    t4n = run(4 * N)
    thrn, thr4n = ROWS / tn, ROWS / t4n
    eff = (thr4n / thrn) / 4
    print(json.dumps({
        "rows": ROWS, "n": N, "4n": 4 * N,
        f"sec@{N}": round(tn, 3), f"sec@{4*N}": round(t4n, 3),
        f"rows_per_sec@{N}": round(thrn, 1), f"rows_per_sec@{4*N}": round(thr4n, 1),
        "speedup_n_to_4n": round(thr4n / thrn, 3),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
