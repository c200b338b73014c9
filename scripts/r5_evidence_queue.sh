#!/usr/bin/env bash
# Round-5 one-shot evidence queue (runs with the rev-i watcher PAUSEd):
#   1. exec-batch B=3 8M pair  (verdict r4 #1b — amortized driver constant)
#   2-3. two 64M size rows     (verdict r4 #2 — >=3 rows per size)
#   4. a 32M size row at 36g   (replaces the pair the 48g OOM killed)
# Each step waits for the instantaneous busy-core count to drop under 3
# (CPU bursts make rows garbage; the min-protocol tolerates noise but a
# fully contended pair is 12 wasted minutes). Size rows run with a 36g
# child heap: two 48g JVMs + in-flight tmpfs shuffle OOMed the box twice
# (64M in the first r5 session, 32M today at anon-rss 38.7G).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/SCALING_RUNS_r5.jsonl"
LOG="$REPO/.bench-cache/r5_evidence.log"
SHMDIR="/dev/shm/spark-graft-local"
mkdir -p "$SHMDIR"

busy() {
  python3 - <<'EOF'
import time
def s():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4]
t0, i0 = s(); time.sleep(0.4); t1, i1 = s()
print(round((t1 - t0 - (i1 - i0)) / max(t1 - t0, 1) * 32, 2))
EOF
}

wait_quiet() {
  while :; do
    B=$(busy)
    python3 -c "exit(0 if float('$B') < 3.0 else 1)" && { echo "$(date -u +%FT%T) fire busy=$B" >> "$LOG"; return; }
    sleep 30
  done
}

sweep() { find "$SHMDIR" -mindepth 1 -maxdepth 1 -mmin +45 -exec rm -rf {} + 2>/dev/null; }

run() {  # run ENV=V... -- args
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local r
  r=$(cd "$REPO" && env "${envs[@]}" timeout 3600 \
      python scripts/scaling_bench.py "$@" 2>>"$LOG" | tail -1)
  [ -n "$r" ] && echo "$r" >> "$OUT" && echo "$(date -u +%FT%T) row: $r" >> "$LOG"
}

echo "$(date -u +%FT%T) queue start" >> "$LOG"
sweep; wait_quiet
run SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_EXEC_BATCH=3 -- 8000000 4 2 5 128 100 4
sweep; wait_quiet
run SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=36g -- 64000000 4 1 5 128 100 3
sweep; wait_quiet
run SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=36g -- 64000000 4 1 5 128 100 3
sweep; wait_quiet
run SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=36g -- 32000000 4 2 5 128 100 2
echo "$(date -u +%FT%T) queue done" >> "$LOG"
