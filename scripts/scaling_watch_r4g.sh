#!/usr/bin/env bash
# Round-4 scaling watch, rev g. Change vs rev f: SIGNATURE-DISPATCHED
# window use. The round-4 shuffle-dir A/Bs showed the foreign load has
# two distinct components with opposite remedies:
#   * CPU component (busy cores > 2): nothing clean can run — sleep.
#   * I/O component (busy < 2, loadavg high): dirty-page pressure
#     throttles /tmp shuffle writes ~1.6x (SHUFFLEDIR_AB_r4.jsonl) but
#     leaves /dev/shm untouched — run the dense pair on tmpfs local
#     dirs; the row is tagged local_dirs and summarized as its own
#     series (protocol_headline.py keeps it out of the /tmp minima).
#   * Genuinely quiet (busy < 2 AND loadavg < 4): the /tmp protocol
#     pair first (the graded series), then the advisory A/B.
# Everything else carried from rev f: flock single-instance, PAUSE
# honored, tracked output files, busy-core gate from /proc/stat.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$REPO/SCALING_RUNS_r4.jsonl"
ABOUT="$REPO/ADVISORY_AB_r4.jsonl"
QOUT="$REPO/BENCH_QUIET_r4.jsonl"
LOG="$CACHE/watch_r4g.log"
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

quiet_probe() {  # retry the busy probe: the 16c sampler's ~16-20s execs
  # look like foreign load to a single 0.4s probe, starving this watch
  # of windows the sampler keeps winning. Three probes spread over ~40s
  # straddle any single sampler exec; once we fire, RUNNING preempts
  # the sampler until the cycle ends.
  local i
  for i in 1 2 3; do
    B=$(busy_cores)
    if python3 -c "exit(0 if float('$B') < 2.0 else 1)"; then return 0; fi
    sleep 18
  done
  return 1
}

QUIET_CYCLE=0
NOISY_CYCLE=0
while true; do
  if paused; then sleep 60; continue; fi
  L=$(load1)
  if quiet_probe; then
    touch "$CACHE/RUNNING"
    if python3 -c "exit(0 if float('$L') < 4.0 else 1)"; then
      echo "$(date -u +%FT%T) quiet=$QUIET_CYCLE fire busy=$B load=$L" >> "$LOG"
      for i in 1 2; do
        paused && break
        run_row "$OUT" -- 8000000 4 3 5 128 100 6
      done
      if ! paused; then
        R=$(cd "$REPO" && timeout 1200 python scripts/probe_advisory.py 16 5 2>>"$LOG" | tail -1)
        [ -n "$R" ] && echo "$R" >> "$ABOUT"
      fi
      if [ $((QUIET_CYCLE % 2)) -eq 0 ] && ! paused; then
        R=$(cd "$REPO" && timeout 1800 python scripts/probe_advisory.py 4 3 2>>"$LOG" | tail -1)
        [ -n "$R" ] && echo "$R" >> "$ABOUT"
      fi
      if [ $((QUIET_CYCLE % 3)) -eq 1 ] && ! paused; then
        R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
        [ -n "$R" ] && echo "$R" >> "$QOUT"
      fi
      QUIET_CYCLE=$((QUIET_CYCLE + 1))
    else
      echo "$(date -u +%FT%T) noisy=$NOISY_CYCLE fire busy=$B load=$L (tmpfs pair)" >> "$LOG"
      run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" -- 8000000 4 3 5 128 100 6
      NOISY_CYCLE=$((NOISY_CYCLE + 1))
    fi
    rm -f "$CACHE/RUNNING"
  fi
  sleep 120
done
