#!/usr/bin/env bash
# Round-5 one-shot evidence queue #2 (chains after r5_evidence_queue.sh):
#   1. combined exec3+16m 8M pair on tmpfs — both north-rule mitigations
#      (driver-constant amortization + no AQE pair merges) together for
#      the first time
#   2. a third 64M size row at a 28g child heap — the 36g 16c child was
#      OOM-killed at anon-rss 40.3G under foreign memory pressure (the
#      box, not the heap, is the ceiling; rows carry driver_mem so the
#      series stays auditable)
#   3. a 128M size row (28g heap, tmpfs shuffle) — caps the size-trend
#      series 8M -> 32M -> 64M -> 128M; input gen (~2.6 GB parquet) runs
#      inside the child like every other size
#   4. a second combined exec3+16m pair
# Then removes PAUSE and starts the rev-k watch.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/SCALING_RUNS_r5.jsonl"
LOG="$REPO/.bench-cache/r5_evidence2.log"
SHMDIR="/dev/shm/spark-graft-local"
mkdir -p "$SHMDIR"

# wait for queue #1 to finish (it owns the box + PAUSE until then)
while pgrep -f 'r5_evidence_queue\.sh' | grep -qv "$$"; do sleep 60; done

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

run() {  # run TIMEOUT ENV=V... -- args
  local t="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local r
  r=$(cd "$REPO" && env "${envs[@]}" timeout "$t" \
      python scripts/scaling_bench.py "$@" 2>>"$LOG" | tail -1)
  [ -n "$r" ] && echo "$r" >> "$OUT" && echo "$(date -u +%FT%T) row: $r" >> "$LOG"
}

echo "$(date -u +%FT%T) queue2 start" >> "$LOG"
sweep; wait_quiet
run 2400 SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_EXEC_BATCH=3 SPARK_GRAFT_ADVISORY=16m -- 8000000 4 2 5 128 100 4
sweep; wait_quiet
run 3600 SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=28g -- 64000000 4 1 5 128 100 3
sweep; wait_quiet
run 5400 SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=28g -- 128000000 4 1 5 128 100 2
sweep; wait_quiet
run 2400 SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_EXEC_BATCH=3 SPARK_GRAFT_ADVISORY=16m -- 8000000 4 2 5 128 100 4
echo "$(date -u +%FT%T) queue2 done; starting rev-k watch" >> "$LOG"
rm -f "$REPO/.bench-cache/PAUSE"
nohup bash "$REPO/scripts/scaling_watch_r5k.sh" >> "$REPO/.bench-cache/watch_r5_nohup.log" 2>&1 &
