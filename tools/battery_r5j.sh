#!/bin/bash
# Battery r5j (round 5): two remaining record candidates.
#  (a) trained natural-EOS decode for the SPATIAL flagship config
#      (runs/msvd_r4_flagship, 49 regions) — r5a/r5g only measured the
#      temporal config; the realistic-length story should cover the
#      paper's headline (spatial) model too, bf16 and int8.
#  (b) int8 AOT serving E2E: bench --what serve with the quant baked
#      into the exported artifact + the bank-resident ids phase — the
#      round-4 id-addressed record (3,594 captions/s over HTTP) was
#      bf16; W8A8 measured +31% on live decode, so the daemon record
#      should move too.
set -u
OUT=${1:-/tmp/battery_r5j}
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

echo "=== trained decode, spatial flagship, bf16 b=384 ===" >> "$OUT/summary.txt"
python bench.py --trained runs/msvd_r4_flagship \
  --trained-bank data/msvd/bank.npz --batch 384 \
  > "$OUT/flagship_bf16.json" 2> "$OUT/flagship_bf16.err"
tail -1 "$OUT/flagship_bf16.json" >> "$OUT/summary.txt"

echo "=== trained decode, spatial flagship, int8 b=384 ===" >> "$OUT/summary.txt"
python bench.py --trained runs/msvd_r4_flagship \
  --trained-bank data/msvd/bank.npz --trained-quant int8 --batch 384 \
  > "$OUT/flagship_int8.json" 2> "$OUT/flagship_int8.err"
tail -1 "$OUT/flagship_int8.json" >> "$OUT/summary.txt"

echo "=== int8 AOT serving E2E (temporal, bank-resident) ===" >> "$OUT/summary.txt"
python bench.py --what serve --run-dir runs/msvd_r4_temporal \
  --serve-bank data/msvd/bank.npz --serve-quant int8 \
  > "$OUT/serve_int8.json" 2> "$OUT/serve_int8.err"
tail -1 "$OUT/serve_int8.json" >> "$OUT/summary.txt"

echo "BATTERY_R5J_DONE" >> "$OUT/summary.txt"
