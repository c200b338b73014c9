#!/usr/bin/env bash
# Round-3 quiet-window scaling watch, revision c (adds a quiet-window full bench.py run every 3rd cycle, VERDICT r2 #5): the 4-core quiet min is
# converged (47.8-50s across many rounds); the missing evidence is a QUIET
# 16-core sample. Each firing runs the dense headline config with 3
# interleaved rounds plus 6 extra 16c-only rounds (see scaling_bench.py
# EXTRA_4N rationale). Secondary configs + profiles every third cycle.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/.bench-cache/${SCALING_OUT:-scaling_runs_r3.jsonl}"
mkdir -p "$REPO/.bench-cache"
CYCLE=0
while true; do
  if [ -f "$REPO/.bench-cache/PAUSE" ]; then sleep 60; continue; fi
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$LOAD') < 1.5 else 1)"; then
    touch "$REPO/.bench-cache/RUNNING"
    for i in 1 2; do
      R=$(cd "$REPO" && timeout 1800 python scripts/scaling_bench.py 8000000 4 3 5 128 100 6 2>/dev/null | tail -1)
      [ -n "$R" ] && echo "$R" >> "$OUT"
      [ -f "$REPO/.bench-cache/PAUSE" ] && break
    done
    if [ $((CYCLE % 3)) -eq 1 ] && [ ! -f "$REPO/.bench-cache/PAUSE" ]; then
      R=$(cd "$REPO" && SPARK_GRAFT_CPUS=32 timeout 1200 python bench.py 2>/dev/null | tail -1)
      [ -n "$R" ] && echo "$R" >> "$REPO/.bench-cache/bench_quiet.jsonl"
    fi
    if [ $((CYCLE % 3)) -eq 2 ] && [ ! -f "$REPO/.bench-cache/PAUSE" ]; then
      for ARGS in "8000000 4 3 5 20 1 4" "2000000 4 3 40 20"; do
        R=$(cd "$REPO" && timeout 1800 python scripts/scaling_bench.py $ARGS 2>/dev/null | tail -1)
        [ -n "$R" ] && echo "$R" >> "$OUT"
      done
      R=$(cd "$REPO" && SPARK_GRAFT_RARE_MODE=block timeout 1800 python scripts/scaling_bench.py 2000000 4 3 40 2>/dev/null | tail -1)
      [ -n "$R" ] && echo "$R" >> "$OUT"
      (cd "$REPO" && timeout 900 python scripts/profile_stages.py 16 8000000 5 128 100 >/dev/null 2>&1)
      (cd "$REPO" && timeout 900 python scripts/profile_stages.py 4 8000000 5 128 100 >/dev/null 2>&1)
    fi
    CYCLE=$((CYCLE + 1))
    rm -f "$REPO/.bench-cache/RUNNING"
  fi
  sleep 180
done
