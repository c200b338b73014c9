#!/usr/bin/env bash
# Run a foreground command without colliding with the quiet-window timed
# bench: set the PAUSE flag (blocks NEW bench cycles), wait for any
# in-flight cycle to drain (the watch maintains a RUNNING flag while a
# cycle is active — checking pgrep here would match our own command line
# when the wrapped command mentions the bench scripts), run, then unpause.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/.bench-cache"
touch "$REPO/.bench-cache/PAUSE"
trap 'rm -f "$REPO/.bench-cache/PAUSE"' EXIT
for _ in $(seq 1 120); do
  [ -f "$REPO/.bench-cache/RUNNING" ] || break
  sleep 15
done
"$@"
