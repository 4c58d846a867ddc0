#!/bin/bash
# Battery 13 (round 3): (a) AOT serving artifact E2E at reference
# scale on the chip (export/deserialize/first-call/steady + live
# parity — tools/probe_aot_artifact.py); (b) the grad_accum
# microbatching-vs-remat latency tradeoff on preset-2 training.
# Chained after battery 12.  Detached-run, no kill timeouts.
set -u
OUT=${1:-/tmp/battery13}
B12=${2:-/tmp/battery12/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY12_DONE "$B12" 2>/dev/null && break
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

echo "=== AOT artifact probe (flagship run, batch 256) ===" >> "$OUT/summary.txt"
python tools/probe_aot_artifact.py runs/msvd_r2_long 256 \
  > "$OUT/aot.txt" 2> "$OUT/aot.err"
tail -7 "$OUT/aot.txt" >> "$OUT/summary.txt"

echo "=== preset 2 train --grad-accum 2 ===" >> "$OUT/summary.txt"
python bench.py --no-probe --what train --preset 2 --iters 8 \
  --grad-accum 2 > "$OUT/p2_ga2.json" 2> "$OUT/p2_ga2.err"
tail -1 "$OUT/p2_ga2.json" >> "$OUT/summary.txt"

echo "BATTERY13_DONE" >> "$OUT/summary.txt"
