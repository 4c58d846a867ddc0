#!/bin/bash
# Battery r4d (round 4): the two legs the tunnel/warmup-orphan ate:
#   d1  serve bench bank-resident phase (temporal artifact + msvd bank)
#   d2  headline refresh with --pin-repo-cache (the BENCH_r4 record)
set -u
OUT=${1:-/tmp/battery_r4d}
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

echo "=== d1: serve bench incl. bank-resident phase ===" >> "$OUT/summary.txt"
python bench.py --what serve --run-dir runs/msvd_r4_temporal --no-probe \
  --serve-bank data/msvd/bank.npz > "$OUT/serve_bank.json" 2> "$OUT/serve_bank.err"
tail -1 "$OUT/serve_bank.json" >> "$OUT/summary.txt"

echo "=== d2: headline refresh (--pin-repo-cache) ===" >> "$OUT/summary.txt"
python bench.py --iters 8 --pin-repo-cache > "$OUT/headline.json" 2> "$OUT/headline.err"
tail -1 "$OUT/headline.json" >> "$OUT/summary.txt"

echo "BATTERY_R4D_DONE" >> "$OUT/summary.txt"
