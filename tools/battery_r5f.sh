#!/bin/bash
# Battery r5f (round 5): coalescer ISOLATION measurement (VERDICT r4
# Weak #5) — single-threaded pipelined burst client vs the daemon with
# coalescing off/on over the SAME artifact + bank, so the wall-clock
# ratio isolates the feature from the 1-core host contention that
# invalidated the round-4 threaded-client numbers.
# Requires battery r5d's artifact (/tmp/stvd_art_soak) + data/msvd/bank.npz;
# exports its own artifact if missing.
set -u
OUT=${1:-/tmp/battery_r5f}
ART=/tmp/stvd_art_soak
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

if [ ! -d "$ART" ]; then
  echo "=== export artifact (r5d's missing) ===" >> "$OUT/summary.txt"
  python -m stvd.cli.export --run-dir $RUN --out $ART \
    --platforms tpu --batch 1,7,32 > "$OUT/export.log" 2>&1
  tail -1 "$OUT/export.log" >> "$OUT/summary.txt"
fi

echo "=== coalesce isolation (off vs on, k=8 x 100 bursts) ===" >> "$OUT/summary.txt"
python tools/coalesce_isolation.py --artifact $ART \
  --bank data/msvd/bank.npz --port 8061 --k 8 --bursts 100 \
  --wait-ms 4 --out runs/coalesce_r5.json > "$OUT/isolation.log" 2>&1
tail -3 "$OUT/isolation.log" >> "$OUT/summary.txt"

echo "BATTERY_R5F_DONE" >> "$OUT/summary.txt"
