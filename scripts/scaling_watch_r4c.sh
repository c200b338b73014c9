#!/usr/bin/env bash
# Round-4 quiet-window scaling watch, rev c. Adds to rev b: an
# interleaved AQE-coalescing A/B at 16c (event-log profiling showed AQE's
# 64MB advisory merges shuffle partitions into ~2x-sized stragglers on
# the classify stage tail — advisory 16m keeps the 32 fine partitions =
# two even waves at 16 cores). The A/B only runs in quiet windows; if B
# reliably beats A there, the engine default changes. Cycle content
# otherwise as rev b: quiet-gated dense headline rows + extra 16c
# rounds, full bench.py every 3rd cycle, one-time 'dist'-mode row
# (VERDICT r3 #7), stage profiles every 3rd cycle.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$CACHE/${SCALING_OUT:-scaling_runs_r4.jsonl}"
LOG="$CACHE/watch_r4c.log"
mkdir -p "$CACHE"
exec 9>"$CACHE/watch.lock"
flock -n 9 || { echo "another watch holds the lock" >&2; exit 1; }

paused() { [ -f "$CACHE/PAUSE" ]; }

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
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$LOAD') < 1.5 else 1)"; then
    touch "$CACHE/RUNNING"
    echo "$(date -u +%FT%T) cycle=$CYCLE fire load=$LOAD" >> "$LOG"
    for i in 1 2; do
      paused && break
      run_row "$OUT" -- 8000000 4 3 5 128 100 6
    done
    if ! paused; then
      R=$(cd "$REPO" && timeout 1200 python scripts/probe_advisory.py 16 4 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$CACHE/advisory_ab.jsonl"
    fi
    if [ $((CYCLE % 3)) -eq 1 ] && ! paused; then
      R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
      [ -n "$R" ] && echo "$R" >> "$CACHE/bench_quiet.jsonl"
    fi
    if [ $((CYCLE % 3)) -eq 2 ] && ! paused; then
      if [ ! -f "$CACHE/dist_row_done" ]; then
        run_row "$OUT" SPARK_GRAFT_RARE_MODE=dist -- 8000000 4 2 5 128 100
        touch "$CACHE/dist_row_done"
      fi
      paused || run_row "$OUT" -- 8000000 4 3 5 20 1 4
      paused || run_row "$OUT" -- 2000000 4 3 40 20
      paused || (cd "$REPO" && timeout 900 python scripts/profile_stages.py 16 8000000 5 128 100 >>"$LOG" 2>&1)
      paused || (cd "$REPO" && timeout 900 python scripts/profile_stages.py 4 8000000 5 128 100 >>"$LOG" 2>&1)
    fi
    CYCLE=$((CYCLE + 1))
    rm -f "$CACHE/RUNNING"
  fi
  sleep 180
done
