#!/bin/bash
# Battery r4f (round 4): bank-resident serving A/B — AFTER numbers for
# the fused gather+decode ids path (api.chunked_caption_ids).
#
# Battery r4e measured the BEFORE state over the temporal flagship:
#   POST /caption_ids b=1 p50 51.8 ms (raw wire: 34.6) — each unjitted
#   bank-gather op costs ~6.5 ms through the relay;
#   bulk-256 47.2 captions/s — measured COLD (first call on the b=256
#   graph pays the AOT load; raw-wire bulk was 380.7 warm).
# The fix fuses the row gather INTO the decode dispatch (one dispatch
# per chunk) and warms the bulk bucket before timing.
#
# Sequential single-JAX-process chain; detached-run, no kill timeouts
# (SIGKILL/SIGTERM on a TPU client wedges the axon tunnel for hours).
set -u
OUT=${1:-/tmp/battery_r4f}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 30); do
  if bash tools/tpu_probe.sh 110 > /dev/null 2>&1; then
    echo "healthy at attempt $i" >> "$OUT/summary.txt"
    break
  fi
  echo "wedged at attempt $i; sleeping 600s" >> "$OUT/summary.txt"
  sleep 600
done

echo "=== serve bench (temporal flagship, raw wire + bank-resident) ===" \
  >> "$OUT/summary.txt"
python bench.py --what serve --run-dir runs/msvd_r4_temporal --no-probe \
  --serve-bank data/msvd/bank.npz > "$OUT/serve_bank.json" \
  2> "$OUT/serve_bank.err"
tail -1 "$OUT/serve_bank.json" >> "$OUT/summary.txt"
echo "BATTERY_R4F_DONE" >> "$OUT/summary.txt"
