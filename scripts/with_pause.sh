#!/usr/bin/env bash
# Run a foreground command without colliding with the quiet-window timed
# bench: set the PAUSE flag (blocks NEW bench cycles), wait for any
# in-flight bench/profile to drain, run, then unpause.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/.bench-cache"
touch "$REPO/.bench-cache/PAUSE"
trap 'rm -f "$REPO/.bench-cache/PAUSE"' EXIT
for _ in $(seq 1 120); do
  pgrep -f "scripts/scaling_bench.py" >/dev/null || pgrep -f "scripts/profile_stages.py" >/dev/null || break
  sleep 15
done
"$@"
