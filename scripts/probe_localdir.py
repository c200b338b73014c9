#!/usr/bin/env python
"""Interleaved A/B: shuffle local dir on disk (/tmp) vs tmpfs (/dev/shm).

Motivation: the host's external load is partly uninterruptible I/O
(loadavg ~15 while /proc/stat shows <1 busy core), and Spark's local
dirs default to disk-backed /tmp — so shuffle writes/reads contend with
external disk traffic the CPU gate can't see. /dev/shm is a 126 GiB
unused tmpfs; the headline job's shuffle footprint is a few hundred MB.
RAM-backed local dirs are standard practice on large-memory nodes and
decouple the scaling measurement from foreign disk I/O.

Spawns TWO local[16] children (idle JVMs don't contend) differing only
in SPARK_LOCAL_DIRS, alternates timed executions when the box is
instantaneously quiet, and reports per-variant minima.

Usage: python scripts/probe_localdir.py [samples_per_variant] [cpus]
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SAMPLES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
sys.argv = ["probe_localdir", "8000000", "4", "0", "5", "128", "100"]
import scaling_bench  # noqa: E402


def _stat():
    vals = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(vals), vals[3] + vals[4]


def busy_cores(window: float = 0.4, ncpu: int = 32) -> float:
    t0, i0 = _stat()
    time.sleep(window)
    t1, i1 = _stat()
    dt = max(t1 - t0, 1)
    return (dt - (i1 - i0)) / dt * ncpu


def spawn_env(cpus: int, local_dirs: str | None) -> subprocess.Popen:
    repo = os.path.dirname(HERE)
    env = dict(os.environ)
    if local_dirs:
        os.makedirs(local_dirs, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = local_dirs
    return subprocess.Popen(
        [sys.executable, "-c", scaling_bench.CHILD % {"repo": repo},
         str(cpus), "8000000", "5", "128", "100"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env,
    )


def main():
    children = {}
    for tag, ld in (("tmp", None), ("shm", "/dev/shm/spark-graft-local")):
        children[tag] = spawn_env(CPUS, ld)
        scaling_bench.wait_ready(children[tag])
    res = {k: [] for k in children}
    busys = []
    taken = 0
    while taken < SAMPLES:
        bc = busy_cores()
        if bc > 2.0:
            time.sleep(5)
            continue
        for tag in children:
            dt = scaling_bench.one(children[tag])
            res[tag].append(round(dt, 2))
            busys.append(round(bc, 2))
            print(f"s{taken} {tag} {dt:.2f}s busy_pre={bc:.2f}", flush=True)
        taken += 1
        time.sleep(2)
    for c in children.values():
        try:
            c.stdin.close(); c.wait(timeout=30)
        except Exception:
            c.kill()
    print(json.dumps({"cpus": CPUS, "busy_pre": busys,
                      **{k: {"min": min(v), "all": v} for k, v in res.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
