#!/bin/bash
# Battery 11 (round 3): train_fwd_kernel before/after at preset-3
# reference scale — decides whether 'auto' stays TPU-default-on.
# Chained after battery 10.  Detached-run, no kill timeouts.
set -u
OUT=${1:-/tmp/battery11}
B10=${2:-/tmp/battery10/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY10_DONE "$B10" 2>/dev/null && break
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

echo "=== preset 3 train --fwd-kernel off ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 3 --iters 10 \
  --fwd-kernel off > "$OUT/p3_off.json" 2> "$OUT/p3_off.err"
tail -1 "$OUT/p3_off.json" >> "$OUT/summary.txt"

echo "=== preset 3 train --fwd-kernel on ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 3 --iters 10 \
  --fwd-kernel on > "$OUT/p3_on.json" 2> "$OUT/p3_on.err"
tail -1 "$OUT/p3_on.json" >> "$OUT/summary.txt"

echo "=== preset 3 train --fwd-kernel on, bf16 slots ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 3 --iters 10 \
  --fwd-kernel on --opt-slots bfloat16 > "$OUT/p3_on_bf16.json" 2> "$OUT/p3_on_bf16.err"
tail -1 "$OUT/p3_on_bf16.json" >> "$OUT/summary.txt"

echo "BATTERY11_DONE" >> "$OUT/summary.txt"
