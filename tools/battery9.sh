#!/bin/bash
# Battery 9 (round 3): serving-latency measurement (new bench --what
# latency) at reference scale, bf16 + int8. Chained after battery 8.
set -u
OUT=${1:-/tmp/battery9}
B8=${2:-/tmp/battery8/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY8_DONE "$B8" 2>/dev/null && break
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

echo "=== decode latency b=1 beam=5 (bf16 + int8) ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what latency > "$OUT/latency.json" 2> "$OUT/latency.err"
tail -1 "$OUT/latency.json" >> "$OUT/summary.txt"

echo "BATTERY9_DONE" >> "$OUT/summary.txt"
