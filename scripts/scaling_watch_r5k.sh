#!/usr/bin/env bash
# Round-5 scaling watch, rev k. Changes vs rev j:
#   * the noisy tmpfs rotation is re-weighted toward the north-rule gap:
#     arm 0 is the COMBINED exec-batch-3 + 16 MB-advisory pair (both
#     mitigations measured individually: exec3 amortizes the ~0.4 s
#     cluster-size-independent driver constant to ~0.13 s/exec, 16 MB
#     advisory removes the AQE pair-merge straggler tail that landed the
#     0.808 within-run row) — untested together until now;
#   * quiet /tmp cycles alternate the exec_only protocol pair (feeds the
#     cross-round minima) with an exec3 /tmp pair (tagged timed=exec3_mean,
#     separate series in protocol_headline — the protocol-change arm the
#     r4 verdict prescribed, now measured on the protocol medium too);
#   * 32M size rows stay in both rotations (36g child heap).
# Carried from rev j: post-probe loadavg re-read, tracked outputs,
# signature dispatch (CPU-busy -> sleep; I/O-noisy -> tmpfs; quiet -> /tmp),
# stale-shm sweep, PAUSE file, watch.lock.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="$REPO/.bench-cache"
OUT="$REPO/SCALING_RUNS_r5.jsonl"
QOUT="$REPO/BENCH_QUIET_r5.jsonl"
LOG="$CACHE/watch_r5.log"
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

QUIET_CYCLE=0
NOISY_CYCLE=0
sweep_shm() {
  # tmpfs shuffle dirs leaked by timeout-killed JVMs are RAM: anything
  # older than the 2400s run timeout is dead
  find "$SHMDIR" -mindepth 1 -maxdepth 1 -mmin +45 -exec rm -rf {} + 2>/dev/null
}

while true; do
  if paused; then sleep 60; continue; fi
  sweep_shm
  if quiet_probe; then
    # re-read loadavg NOW: quiet_probe may have slept ~40s and the pre-probe
    # value is stale; the /tmp-vs-tmpfs dispatch must use the live signal
    L=$(load1)
    touch "$CACHE/RUNNING"
    if python3 -c "exit(0 if float('$L') < 4.0 else 1)"; then
      # graded /tmp window: protocol pair, exec3 pair, then a 32M size row
      case $((QUIET_CYCLE % 3)) in
        0) echo "$(date -u +%FT%T) quiet q=$QUIET_CYCLE 8m busy=$B load=$L" >> "$LOG"
           run_row "$OUT" -- "${ARGS_8M[@]}" ;;
        1) echo "$(date -u +%FT%T) quiet q=$QUIET_CYCLE 8m-exec3 busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_GRAFT_EXEC_BATCH=3 -- "${ARGS_8M[@]}" ;;
        2) echo "$(date -u +%FT%T) quiet q=$QUIET_CYCLE 32m busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_GRAFT_DRIVER_MEM=36g -- "${ARGS_32M[@]}" ;;
      esac
      if [ $((QUIET_CYCLE % 3)) -eq 1 ] && ! paused; then
        R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>>"$LOG" | tail -1)
        [ -n "$R" ] && echo "$R" >> "$QOUT"
      fi
      QUIET_CYCLE=$((QUIET_CYCLE + 1))
    else
      # noisy-I/O window: tmpfs arms — combined exec3+16m leads the rotation
      case $((NOISY_CYCLE % 4)) in
        0) echo "$(date -u +%FT%T) noisy n=$NOISY_CYCLE exec3+16m busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_EXEC_BATCH=3 SPARK_GRAFT_ADVISORY=16m -- "${ARGS_8M[@]}" ;;
        1) echo "$(date -u +%FT%T) noisy n=$NOISY_CYCLE 32m-rows busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=36g -- "${ARGS_32M[@]}" ;;
        2) echo "$(date -u +%FT%T) noisy n=$NOISY_CYCLE adv16m busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_ADVISORY=16m -- "${ARGS_8M[@]}" ;;
        3) echo "$(date -u +%FT%T) noisy n=$NOISY_CYCLE exec3 busy=$B load=$L" >> "$LOG"
           run_row "$OUT" SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_EXEC_BATCH=3 -- "${ARGS_8M[@]}" ;;
      esac
      NOISY_CYCLE=$((NOISY_CYCLE + 1))
    fi
    rm -f "$CACHE/RUNNING"
  fi
  sleep 120
done
