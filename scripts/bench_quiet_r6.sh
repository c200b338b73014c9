#!/bin/bash
# Quiet-gated frozen-bench runs: wait for loadavg < GATE, run bench.py,
# append its JSON line + load bookends to BENCH_QUIET_r6.jsonl.
# Usage: scripts/bench_quiet_r6.sh [n_runs] [gate]
N=${1:-3}
GATE=${2:-2.0}
cd /root/repo
for i in $(seq 1 "$N"); do
  for w in $(seq 1 360); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" -v g="$GATE" 'BEGIN{exit !(l<g)}' && break
    sleep 5
  done
  L0=$(cut -d' ' -f1 /proc/loadavg)
  T0=$(date +%s)
  OUT=$(python bench.py 2>/dev/null | tail -1)
  T1=$(date +%s)
  L1=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"run\": $i, \"load_pre\": $L0, \"load_post\": $L1, \"wall_s\": $((T1-T0)), \"bench\": $OUT}" >> BENCH_QUIET_r6.jsonl
  echo "run $i done: wall=$((T1-T0))s load_pre=$L0 load_post=$L1"
done
