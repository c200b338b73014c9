#!/usr/bin/env bash
# Round-4 quiet-window scaling watch, rev d. One change vs rev c: the
# fire gate moved from 1-minute loadavg (<1.5) to an instantaneous
# GLOBAL busy-core probe (/proc/stat, 0.4s window) — the same gate the
# 16c sampler already uses. Rationale (BASELINE.md round-4 notes): the
# host's external load is partly uninterruptible I/O outside this PID
# namespace, which inflates loadavg to 14-16 for hours while <1 core is
# actually busy; under that regime rev c fired once in ~4h while CPU sat
# idle. Cycle content reordered so the pending DECISION data (the AQE
# advisory A/B) lands first each cycle, then the one-time 'dist'-mode
# row (VERDICT r3 #7), then dense headline rows; full bench.py and stage
# profiles every 3rd cycle as before.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$CACHE/${SCALING_OUT:-scaling_runs_r4.jsonl}"
LOG="$CACHE/watch_r4d.log"
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
    R=$(cd "$REPO" && timeout 1200 python scripts/probe_advisory.py 16 5 2>>"$LOG" | tail -1)
    [ -n "$R" ] && echo "$R" >> "$CACHE/advisory_ab.jsonl"
    if ! paused && [ ! -f "$CACHE/dist_row_done" ]; then
      run_row "$OUT" SPARK_GRAFT_RARE_MODE=dist -- 8000000 4 2 5 128 100
      touch "$CACHE/dist_row_done"
    fi
    for i in 1 2; do
      paused && break
      run_row "$OUT" -- 8000000 4 3 5 128 100 6
    done
    if [ $((CYCLE % 3)) -eq 1 ] && ! paused; then
      R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$CACHE/bench_quiet.jsonl"
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
