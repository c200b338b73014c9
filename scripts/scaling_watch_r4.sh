#!/usr/bin/env bash
# Round-4 quiet-window scaling watch. Carries the r3c discipline forward
# (VERDICT r3 #8): quiet-gated (loadavg < 1.5) firings of the dense
# headline config with extra 16c-only rounds, a full bench.py run every
# 3rd cycle, secondary configs + stage profiles every 3rd cycle, and a
# ONE-TIME 'dist'-mode dense row (VERDICT r3 #7). Output lands in
# .bench-cache/scaling_runs_r4.jsonl; sync to SCALING_RUNS_r4.jsonl at
# commit points.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/.bench-cache/${SCALING_OUT:-scaling_runs_r4.jsonl}"
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
      if [ ! -f "$REPO/.bench-cache/dist_row_done" ]; then
        R=$(cd "$REPO" && SPARK_GRAFT_RARE_MODE=dist timeout 1800 python scripts/scaling_bench.py 8000000 4 2 5 128 100 2>/dev/null | tail -1)
        [ -n "$R" ] && echo "$R" >> "$OUT" && touch "$REPO/.bench-cache/dist_row_done"
      fi
      for ARGS in "8000000 4 3 5 20 1 4" "2000000 4 3 40 20"; do
        R=$(cd "$REPO" && timeout 1800 python scripts/scaling_bench.py $ARGS 2>/dev/null | tail -1)
        [ -n "$R" ] && echo "$R" >> "$OUT"
      done
      (cd "$REPO" && timeout 900 python scripts/profile_stages.py 16 8000000 5 128 100 >/dev/null 2>&1)
      (cd "$REPO" && timeout 900 python scripts/profile_stages.py 4 8000000 5 128 100 >/dev/null 2>&1)
    fi
    CYCLE=$((CYCLE + 1))
    rm -f "$REPO/.bench-cache/RUNNING"
  fi
  sleep 180
done
