#!/bin/bash
# Battery r4c (round 4): train-tail-kernel A/B (model.train_tail_kernel)
# at presets 3 (temporal) and 2 (spatial) — the whole-step-tail
# experiment's chip numbers (VERDICT r3 Next #3).  Run AFTER r4b.
set -u
OUT=${1:-/tmp/battery_r4c}
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

echo "=== c1: gates-kernel A/B retry (4-D strip-block Mosaic fix) ===" >> "$OUT/summary.txt"
python tools/probe_gates_kernel.py 8 > "$OUT/gates.txt" 2> "$OUT/gates.err"
grep -E "tiny_parity|gates_kernel=|delta|DONE" "$OUT/gates.txt" >> "$OUT/summary.txt" || \
  tail -3 "$OUT/gates.err" >> "$OUT/summary.txt"

for preset in 3 2; do
  for tk in off on; do
    echo "=== preset $preset tail_kernel=$tk ===" >> "$OUT/summary.txt"
    python bench.py --what train --preset $preset --tail-kernel $tk \
      --iters 10 > "$OUT/p${preset}_${tk}.json" 2> "$OUT/p${preset}_${tk}.err"
    tail -1 "$OUT/p${preset}_${tk}.json" >> "$OUT/summary.txt"
  done
done

echo "=== c3: serve bench WITH the bank-resident phase ===" >> "$OUT/summary.txt"
python bench.py --what serve --run-dir runs/msvd_r4_temporal --no-probe \
  --serve-bank data/msvd/bank.npz > "$OUT/serve_bank.json" 2> "$OUT/serve_bank.err"
tail -1 "$OUT/serve_bank.json" >> "$OUT/summary.txt"

echo "BATTERY_R4C_DONE" >> "$OUT/summary.txt"
