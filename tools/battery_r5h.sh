#!/bin/bash
# Battery r5h (round 5): beam-trap quality cell — the beam-vs-greedy
# separator that battery r5b measured as a wash (0.3x noise).  The v2
# confusable feature-mix trap dissolves at convergence; this cell
# instead places the trap in the REFERENCE distribution
# (data/synthetic.py p_generic: generic form 40% of refs with
# high-entropy continuations vs two specific surface forms at 30%
# each with deterministic continuations), so greedy's argmax commits
# to the weaker branch by construction.  3 seeds, per-seed PAIRED
# beam-vs-greedy deltas on the same trained weights.
set -u
OUT=${1:-/tmp/battery_r5h}
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

echo "=== beamtrap ablation (3 seeds, paired beam vs greedy) ===" >> "$OUT/summary.txt"
python tools/quality_ablations.py --cells beamtrap \
  --out runs/quality_v2_trap > "$OUT/ablations.log" 2>&1
grep -E '^\{|^- |^\| ' "$OUT/ablations.log" >> "$OUT/summary.txt"

echo "BATTERY_R5H_DONE" >> "$OUT/summary.txt"
