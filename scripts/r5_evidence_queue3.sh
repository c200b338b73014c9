#!/usr/bin/env bash
# Round-5 one-shot evidence queue #3: a third 64M size row at a 20g child
# heap. The 36g 16c child OOMed once out of twice (anon-rss 40.3G when the
# foreign load spiked RAM use), 28g OOMed at anon-rss 31.6G in a worse
# spike; 20g caps our JVM at ~23G RSS so a ~40G foreign spike still fits.
# 128M was attempted and is out of reach on tmpfs — its shuffle footprint
# passed 55G of /dev/shm with the box at 4G free (measured 07:57 today);
# the size series caps at 64M on tmpfs on this host.
# Re-creates PAUSE so the rev-k watch idles while the row runs.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/SCALING_RUNS_r5.jsonl"
LOG="$REPO/.bench-cache/r5_evidence3.log"
SHMDIR="/dev/shm/spark-graft-local"
mkdir -p "$SHMDIR"

while pgrep -f 'r5_evidence_queue2\.sh' | grep -qv "$$"; do sleep 60; done
touch "$REPO/.bench-cache/PAUSE"
# let an in-flight watch cycle drain before firing
sleep 30

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

echo "$(date -u +%FT%T) queue3 start" >> "$LOG"
while :; do
  B=$(busy)
  python3 -c "exit(0 if float('$B') < 3.0 else 1)" && { echo "$(date -u +%FT%T) fire busy=$B" >> "$LOG"; break; }
  sleep 30
done
r=$(cd "$REPO" && env SPARK_LOCAL_DIRS="$SHMDIR" SPARK_GRAFT_DRIVER_MEM=20g timeout 3600 \
    python scripts/scaling_bench.py 64000000 4 1 5 128 100 3 2>>"$LOG" | tail -1)
[ -n "$r" ] && echo "$r" >> "$OUT" && echo "$(date -u +%FT%T) row: $r" >> "$LOG"
echo "$(date -u +%FT%T) queue3 done" >> "$LOG"
rm -f "$REPO/.bench-cache/PAUSE"
