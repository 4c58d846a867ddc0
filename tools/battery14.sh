#!/bin/bash
# Battery 14 (round 3): end-of-round headline refresh — full bench.py
# decode headline (also populates /tmp/stvd_bench_last_tpu.json for
# the wedged-tunnel fallback) + serving latency.  Chained after 13.
set -u
OUT=${1:-/tmp/battery14}
B13=${2:-/tmp/battery13/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY13_DONE "$B13" 2>/dev/null && break
  sleep 300
done

for i in $(seq 1 20); do
  if bash tools/tpu_probe.sh 110 > /dev/null 2>&1; then
    echo "healthy at attempt $i" >> "$OUT/summary.txt"
    break
  fi
  echo "wedged at attempt $i; sleeping 600s" >> "$OUT/summary.txt"
  sleep 600
done

echo "=== headline (auto-kernel) ===" >> "$OUT/summary.txt"
python bench.py --no-probe > "$OUT/headline.json" 2> "$OUT/headline.err"
tail -1 "$OUT/headline.json" >> "$OUT/summary.txt"

echo "=== serving latency ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what latency > "$OUT/latency.json" 2> "$OUT/latency.err"
tail -1 "$OUT/latency.json" >> "$OUT/summary.txt"

echo "BATTERY14_DONE" >> "$OUT/summary.txt"
