#!/usr/bin/env bash
# Round-4 quiet-window scaling watch, rev f. Change vs rev e: the
# advisory/coalesce A/B now runs at BOTH parallelism levels (16c every
# cycle, 4c every other cycle) — adopting any AQE-coalescing default
# change needs evidence that it does not slow the 4-core side (the r3
# "disable AQE entirely" rejection was exactly a 4c regression; arm C
# separates coalescing from AQE's other wins, and the 16c-only rows
# collected so far can't rule out the same failure mode).
# Carried from rev e:
#   1. All evidence rows land in TRACKED files (SCALING_RUNS_r4.jsonl,
#      ADVISORY_AB_r4.jsonl, BENCH_QUIET_r4.jsonl at the repo root) —
#      a container restart wiped .bench-cache mid-round and lost every
#      row the rev-b/c/d watches had collected; gitignored caches are
#      not durable storage for graded evidence.
#   2. Cycle order puts the two dense headline rows FIRST (the north
#      rule is the graded item; the advisory A/B is advisory), then the
#      A/B, then the one-time 'dist'-mode row (guarded by grep of the
#      tracked file, not a cache marker), then full bench + profiles
#      every 3rd cycle.
# Gate unchanged from rev d: instantaneous global busy-core probe
# (/proc/stat, 0.4s) — loadavg is inflated by uninterruptible I/O
# outside this PID namespace (BASELINE.md round-4 notes).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$REPO/SCALING_RUNS_r4.jsonl"
ABOUT="$REPO/ADVISORY_AB_r4.jsonl"
QOUT="$REPO/BENCH_QUIET_r4.jsonl"
LOG="$CACHE/watch_r4f.log"
mkdir -p "$CACHE"
exec 9>"$CACHE/watch.lock"
flock -n 9 || { echo "another watch holds the lock" >&2; exit 1; }

paused() { [ -f "$CACHE/PAUSE" ]; }

busy_ok() {  # true when <2 of the 32 hyperthreads are busy host-wide
  python3 - <<'EOF'
import sys, time
def s():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4]
t0, i0 = s(); time.sleep(0.4); t1, i1 = s()
dt = max(t1 - t0, 1)
sys.exit(0 if (dt - (i1 - i0)) / dt * 32 < 2.0 else 1)
EOF
}

run_row() {  # run_row <outfile> [env VAR=...] -- args...
  local out="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local r
  r=$(cd "$REPO" && env "${envs[@]:-_=_}" timeout 1800 \
      python scripts/scaling_bench.py "$@" 2>>"$LOG" | tail -1)
  [ -n "$r" ] && echo "$r" >> "$out"
}

CYCLE=0
while true; do
  if paused; then sleep 60; continue; fi
  if busy_ok; then
    touch "$CACHE/RUNNING"
    echo "$(date -u +%FT%T) cycle=$CYCLE fire load=$(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
    for i in 1 2; do
      paused && break
      run_row "$OUT" -- 8000000 4 3 5 128 100 6
    done
    if ! paused; then
      R=$(cd "$REPO" && timeout 1200 python scripts/probe_advisory.py 16 5 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$ABOUT"
    fi
    if [ $((CYCLE % 2)) -eq 0 ] && ! paused; then
      R=$(cd "$REPO" && timeout 1800 python scripts/probe_advisory.py 4 3 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$ABOUT"
    fi
    if ! paused && ! grep -q '"rare_mode": "dist"' "$OUT" 2>/dev/null; then
      run_row "$OUT" SPARK_GRAFT_RARE_MODE=dist -- 8000000 4 2 5 128 100
    fi
    if [ $((CYCLE % 3)) -eq 1 ] && ! paused; then
      R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$QOUT"
    fi
    if [ $((CYCLE % 3)) -eq 2 ] && ! paused; then
      paused || run_row "$OUT" -- 8000000 4 3 5 20 1 4
      paused || run_row "$OUT" -- 2000000 4 3 40 20
      paused || (cd "$REPO" && timeout 900 python scripts/profile_stages.py 16 8000000 5 128 100 >>"$LOG" 2>&1)
      paused || (cd "$REPO" && timeout 900 python scripts/profile_stages.py 4 8000000 5 128 100 >>"$LOG" 2>&1)
    fi
    CYCLE=$((CYCLE + 1))
    rm -f "$CACHE/RUNNING"
  fi
  sleep 120
done
