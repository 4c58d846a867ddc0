#!/bin/bash
# Battery 12 (round 3): train_fwd_kernel before/after on the SPATIAL
# path (preset 2) + combined-kernel production defaults.  Chained after
# battery 11.  Detached-run, no kill timeouts.
set -u
OUT=${1:-/tmp/battery12}
B11=${2:-/tmp/battery11/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY11_DONE "$B11" 2>/dev/null && break
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

echo "=== preset 2 train --fwd-kernel off ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 2 --iters 8 \
  --fwd-kernel off > "$OUT/p2_off.json" 2> "$OUT/p2_off.err"
tail -1 "$OUT/p2_off.json" >> "$OUT/summary.txt"

echo "=== preset 2 train --fwd-kernel on ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 2 --iters 8 \
  --fwd-kernel on > "$OUT/p2_on.json" 2> "$OUT/p2_on.err"
tail -1 "$OUT/p2_on.json" >> "$OUT/summary.txt"

echo "BATTERY12_DONE" >> "$OUT/summary.txt"
