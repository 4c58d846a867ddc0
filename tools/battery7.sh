#!/bin/bash
# Battery 7 (round 3): bank-cache probe + headline bench re-check.
# Waits for tunnel health first; detached-run (no kill timeouts on the
# TPU jobs themselves) per ROUND3_NOTES "Machine notes".
set -u
OUT=${1:-/tmp/battery7}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 40); do
  if bash tools/tpu_probe.sh 110 > /dev/null 2>&1; then
    echo "healthy at attempt $i" >> "$OUT/summary.txt"
    break
  fi
  echo "wedged at attempt $i; sleeping 600s" >> "$OUT/summary.txt"
  sleep 600
done

echo "=== bank cache probe ===" >> "$OUT/summary.txt"
python tools/probe_bank_cache.py > "$OUT/bank_cache.txt" 2>&1
tail -4 "$OUT/bank_cache.txt" >> "$OUT/summary.txt"

echo "=== headline bench (auto-kernel, beam 5) ===" >> "$OUT/summary.txt"
python bench.py --no-probe --iters 8 > "$OUT/headline.json" 2> "$OUT/headline.err"
tail -1 "$OUT/headline.json" >> "$OUT/summary.txt"

echo "BATTERY7_DONE" >> "$OUT/summary.txt"
