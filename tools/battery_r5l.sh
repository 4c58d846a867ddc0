#!/bin/bash
# Battery r5l (round 5): the TRAINED natural-EOS GREEDY headline — the
# config-1 path at its measured b=1024 sweet spot (battery r5i) on the
# trained temporal flagship, bf16 + int8.  Completes the trained-decode
# table: beam (r5a/r5g) and greedy now both have realistic-length
# numbers next to their EOS-suppressed worst cases.
set -u
OUT=${1:-/tmp/battery_r5l}
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

echo "=== trained GREEDY decode, temporal, bf16 b=1024 ===" >> "$OUT/summary.txt"
python bench.py --trained runs/msvd_r4_temporal \
  --trained-bank data/msvd/bank.npz --trained-mode greedy \
  > "$OUT/greedy_bf16.json" 2> "$OUT/greedy_bf16.err"
tail -1 "$OUT/greedy_bf16.json" >> "$OUT/summary.txt"

echo "=== trained GREEDY decode, temporal, int8 b=1024 ===" >> "$OUT/summary.txt"
python bench.py --trained runs/msvd_r4_temporal \
  --trained-bank data/msvd/bank.npz --trained-mode greedy \
  --trained-quant int8 \
  > "$OUT/greedy_int8.json" 2> "$OUT/greedy_int8.err"
tail -1 "$OUT/greedy_int8.json" >> "$OUT/summary.txt"

echo "BATTERY_R5L_DONE" >> "$OUT/summary.txt"
