#!/bin/bash
# Battery 10 (round 3): b=1 weight-residency probe — does the 73 MB
# int8 gates stack stay VMEM-resident across decode steps (the
# battery-9 int8 ratio-0.94 hypothesis)?  Detached-run, no kill
# timeouts on the TPU job (ROUND3_NOTES "Machine notes").
set -u
OUT=${1:-/tmp/battery10}
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

echo "=== b=1 gates weight-residency probe ===" >> "$OUT/summary.txt"
python tools/probe_b1_weights.py > "$OUT/b1_weights.txt" 2>&1
tail -7 "$OUT/b1_weights.txt" >> "$OUT/summary.txt"

echo "BATTERY10_DONE" >> "$OUT/summary.txt"
