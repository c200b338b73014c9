#!/usr/bin/env python
"""Shuffle-dir A/B under the NOISY-I/O signature (busy<2, loadavg high).

Round-4 finding: the foreign load is partly CPU-invisible uninterruptible
I/O — the 16c sampler measured 26-49 s execs at busy_pre ~0.02 cores
under loadavg 12-17, vs ~15-18 s in calmer minutes. Hypothesis: the
foreign tasks keep the disk's writeback path saturated, so OUR shuffle
writes (~1 GB/exec to /tmp) throttle in balance_dirty_pages even with
all 32 CPUs free. tmpfs (/dev/shm) bypasses dirty throttling — it lost
the QUIET-window A/B by ~1.5 s (extra page copies, probe_localdir.py)
but should be immune to foreign dirty-page pressure.

Unlike probe_localdir.py this takes samples REGARDLESS of load (that is
the point — run it when the box shows the noisy signature) and records
busy/load per sample so the pairs are interpretable. If shm wins
decisively at loadavg>8/busy<2, the watch gains a parallel tmpfs series
(same job, same input, BOTH levels on tmpfs) that turns those
currently-useless windows into usable scaling samples.

Usage: python scripts/probe_localdir_noisy.py [rounds] [cpus]
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
sys.argv = ["probe_localdir_noisy", "8000000", "4", "0", "5", "128", "100"]
import scaling_bench  # noqa: E402

from probe_localdir import busy_cores, spawn_env  # noqa: E402


def main():
    children = {}
    for tag, ld in (("tmp", None), ("shm", "/dev/shm/spark-graft-local")):
        children[tag] = spawn_env(CPUS, ld)
        scaling_bench.wait_ready(children[tag])
    res = {k: [] for k in children}
    trace = []
    for _ in range(ROUNDS):
        for tag, p in children.items():
            b = round(busy_cores(), 2)
            load = round(os.getloadavg()[0], 2)
            t = scaling_bench.one(p)
            res[tag].append(round(t, 2))
            trace.append({"arm": tag, "busy_pre": b, "load_pre": load})
    for p in children.values():
        try:
            p.stdin.close()
            p.wait(timeout=60)
        except Exception:
            p.kill()
    out = {"mode": "localdir_noisy", "cpus": CPUS, "rounds": ROUNDS, "trace": trace}
    for k, v in res.items():
        out[k] = {"min": min(v), "all": v}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
