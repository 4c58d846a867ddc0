#!/bin/bash
# Battery 8 (round 3): chained after battery 7 — clean p4 island probe
# (post beta-shape fix), DP decode sanity, greedy headline re-check.
# Waits for battery 7's DONE marker, then for tunnel health.
set -u
OUT=${1:-/tmp/battery8}
B7=${2:-/tmp/battery7/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY7_DONE "$B7" 2>/dev/null && break
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

echo "=== p4 decode islands (beta-shape fix) ===" >> "$OUT/summary.txt"
python tools/probe_p4_decode.py > "$OUT/p4_islands.txt" 2>&1
tail -6 "$OUT/p4_islands.txt" >> "$OUT/summary.txt"

echo "=== dp decode (1 chip) ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what dp > "$OUT/dp.json" 2> "$OUT/dp.err"
tail -1 "$OUT/dp.json" >> "$OUT/summary.txt"

echo "=== preset 2 train (production defaults re-check) ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 2 --iters 8 > "$OUT/p2_train.json" 2> "$OUT/p2_train.err"
tail -1 "$OUT/p2_train.json" >> "$OUT/summary.txt"

echo "BATTERY8_DONE" >> "$OUT/summary.txt"
