#!/bin/bash
# Battery r5b (round 5): quality ablation table on the v2
# discriminative benchmark (VERDICT r4 next #4) — trains the config
# ablations (temporal vs spatial, ±motion, beam vs greedy, ss_prob)
# over 3 seeds each and writes runs/quality_v2/ablation_table.md.
set -u
OUT=${1:-/tmp/battery_r5b}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 20); do
  if bash tools/tpu_probe.sh 110 > /dev/null 2>&1; then
    echo "healthy at attempt $i" >> "$OUT/summary.txt"
    break
  fi
  echo "wedged at attempt $i; sleeping 600s" >> "$OUT/summary.txt"
  sleep 600
done

echo "=== quality ablations (v2 discriminative benchmark) ===" >> "$OUT/summary.txt"
python tools/quality_ablations.py --out runs/quality_v2 \
  > "$OUT/ablations.log" 2>&1
tail -20 "$OUT/ablations.log" >> "$OUT/summary.txt"

echo "BATTERY_R5B_DONE" >> "$OUT/summary.txt"
