#!/bin/bash
# One-shot TPU benchmark battery; run when the tunnel is healthy.
# Usage: bash .scratch/tpu_battery.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout 1500 python "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  tail -1 "$OUT/$name.json" | tee -a "$OUT/summary.txt"
}

run decode_full       bench.py --no-probe --iters 8
run decode_full_kern  bench.py --no-probe --iters 8 --kernel
run decode_small      bench.py --no-probe --small --iters 20
run train_full        bench.py --no-probe --what train
run train_full_kern   bench.py --no-probe --what train --kernel
run dp_1chip          bench.py --no-probe --what dp
echo "battery done -> $OUT" | tee -a "$OUT/summary.txt"
