#!/bin/bash
# Battery r5g (round 5): trained natural-EOS decode under int8 — the
# realistic-length headline (battery r5a: 15,060 captions/s bf16) with
# the W8A8 serving path engaged, at the bf16 sweet spot (384) and the
# int8 sweet spot (448, battery r4j).  Requires the trained
# runs/msvd_r4_temporal checkpoint + data/msvd/bank.npz from r5a.
set -u
OUT=${1:-/tmp/battery_r5g}
RUN=runs/msvd_r4_temporal
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

echo "=== trained decode, int8, b=384 ===" >> "$OUT/summary.txt"
python bench.py --trained $RUN --trained-bank data/msvd/bank.npz \
  --trained-quant int8 --batch 384 \
  > "$OUT/int8_b384.json" 2> "$OUT/int8_b384.err"
tail -1 "$OUT/int8_b384.json" >> "$OUT/summary.txt"

echo "=== trained decode, int8, b=448 (int8 sweet spot) ===" >> "$OUT/summary.txt"
python bench.py --trained $RUN --trained-bank data/msvd/bank.npz \
  --trained-quant int8 --batch 448 \
  > "$OUT/int8_b448.json" 2> "$OUT/int8_b448.err"
tail -1 "$OUT/int8_b448.json" >> "$OUT/summary.txt"

echo "BATTERY_R5G_DONE" >> "$OUT/summary.txt"
