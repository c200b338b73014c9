#!/usr/bin/env bash
# Round-4 scaling watch, rev h. Change vs rev g: SIZE-ALTERNATING pairs.
# Motivation (round-4 critical-path analysis, BASELINE.md): the measured
# non-scaling per-execution constant (~0.3-0.5 s of driver re-optimize +
# stage-launch floor) is cluster-size-independent, so at the 8M-row proxy
# it costs the 16c side ~3% of wall-clock and biases raw efficiency DOWN
# by ~0.02 — at the 10^12-row target it amortizes to nothing. The honest
# way to evidence that claim is to MEASURE it: run the identical job at
# 4x the input (32M rows) where the constant is 4x smaller relative to
# work, and report the size trend. Rev h therefore alternates per fired
# window:
#   even cycles -> the 32M pair (rounds=2, extra 16c=2 to fit a window;
#                  started empty so it gets priority — see the inline
#                  '32M first' comment at the dispatch; its rows are a
#                  SEPARATE series keyed rows=32000000, summarized by
#                  protocol_headline.py as size_series);
#   odd cycles  -> the 8M protocol pair (keeps chasing the cross-round
#                  /tmp minimum; series unchanged).
# Signature dispatch carried from rev g:
#   * CPU component (busy cores > 2): sleep.
#   * I/O component (busy < 2, loadavg high): tmpfs local dirs.
#   * Genuinely quiet (busy < 2 AND loadavg < 4): /tmp (graded series).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$REPO/SCALING_RUNS_r4.jsonl"
QOUT="$REPO/BENCH_QUIET_r4.jsonl"
LOG="$CACHE/watch_r4h.log"
SHMDIR="/dev/shm/spark-graft-local"
mkdir -p "$CACHE" "$SHMDIR"
exec 9>"$CACHE/watch.lock"
flock -n 9 || { echo "another watch holds the lock" >&2; exit 1; }

paused() { [ -f "$CACHE/PAUSE" ]; }

busy_cores() {
  python3 - <<'EOF'
import time
def s():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4]
t0, i0 = s(); time.sleep(0.4); t1, i1 = s()
dt = max(t1 - t0, 1)
print(round((dt - (i1 - i0)) / dt * 32, 2))
EOF
}

load1() { cut -d' ' -f1 /proc/loadavg; }

run_row() {  # run_row <outfile> [env VAR=...] -- args...
  local out="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local r
  r=$(cd "$REPO" && env "${envs[@]:-_=_}" timeout 2400 \
      python scripts/scaling_bench.py "$@" 2>>"$LOG" | tail -1)
  [ -n "$r" ] && echo "$r" >> "$out"
}

quiet_probe() {  # three probes over ~40s straddle a sampler exec
  local i
  for i in 1 2 3; do
    B=$(busy_cores)
    if python3 -c "exit(0 if float('$B') < 2.0 else 1)"; then return 0; fi
    sleep 18
  done
  return 1
}

ARGS_8M=(8000000 4 3 5 128 100 6)
ARGS_32M=(32000000 4 2 5 128 100 2)

CYCLE=0
QUIET_CYCLE=0
while true; do
  if paused; then sleep 60; continue; fi
  L=$(load1)
  if quiet_probe; then
    touch "$CACHE/RUNNING"
    # 32M first: the 8M series already holds ~500 16c samples (and the
    # standalone sampler keeps feeding it); the 32M series starts empty.
    if [ $((CYCLE % 2)) -eq 0 ]; then ARGS=("${ARGS_32M[@]}"); else ARGS=("${ARGS_8M[@]}"); fi
    if python3 -c "exit(0 if float('$L') < 4.0 else 1)"; then
      echo "$(date -u +%FT%T) quiet cycle=$CYCLE fire busy=$B load=$L args=${ARGS[*]}" >> "$LOG"
      run_row "$OUT" -- "${ARGS[@]}"
      if [ $((QUIET_CYCLE % 3)) -eq 1 ] && ! paused; then
        R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
        [ -n "$R" ] && echo "$R" >> "$QOUT"
      fi
      QUIET_CYCLE=$((QUIET_CYCLE + 1))
    else
      echo "$(date -u +%FT%T) noisy cycle=$CYCLE fire busy=$B load=$L args=${ARGS[*]} (tmpfs)" >> "$LOG"
      run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" -- "${ARGS[@]}"
    fi
    CYCLE=$((CYCLE + 1))
    rm -f "$CACHE/RUNNING"
  fi
  sleep 120
done
