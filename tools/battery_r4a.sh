#!/bin/bash
# Battery r4a (round 4): regenerate the flagship trained checkpoint
# (the VM wipe between rounds removed runs/*/ckpt — only artifacts are
# committed), then retry the two batteries it stranded:
#   13(a)  AOT artifact E2E at reference scale on the chip
#   15     HTTP serving daemon E2E over a TPU artifact
# Sequential single-JAX-process chain; detached-run, no kill timeouts
# (ROUND3_NOTES "Machine notes": SIGKILL/SIGTERM on a TPU client can
# wedge the axon tunnel for hours).
set -u
OUT=${1:-/tmp/battery_r4a}
RUN=runs/msvd_r4_flagship
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

echo "=== regenerate synthetic MSVD corpus (true-Py2 pickles) ===" >> "$OUT/summary.txt"
python tools/make_synthetic_corpus.py --recipe recipes/msvd.json \
  > "$OUT/corpus.log" 2>&1
tail -2 "$OUT/corpus.log" >> "$OUT/summary.txt"

echo "=== convert to packed bank ===" >> "$OUT/summary.txt"
STVD_FORCE_CPU=1 python -m stvd.cli.convert \
  --features data/msvd/FEAT.pkl --regions data/msvd/REGIONS.pkl \
  --frames 28 --out data/msvd/bank.npz > "$OUT/convert.log" 2>&1
tail -2 "$OUT/convert.log" >> "$OUT/summary.txt"

echo "=== retrain flagship ($RUN, ~14 min on chip) ===" >> "$OUT/summary.txt"
python -m stvd.cli.train --config runs/msvd_r2_long/config.json \
  --set train.save_dir=$RUN > "$OUT/train.log" 2>&1
tail -3 "$OUT/train.log" >> "$OUT/summary.txt"

echo "=== battery 13 retry: AOT artifact probe (batch 256) ===" >> "$OUT/summary.txt"
python tools/probe_aot_artifact.py $RUN 256 \
  > "$OUT/aot.txt" 2> "$OUT/aot.err"
tail -7 "$OUT/aot.txt" >> "$OUT/summary.txt"

echo "=== battery 15 retry: export TPU artifact (batch 1,32, nbest) ===" >> "$OUT/summary.txt"
python -m stvd.cli.export --run-dir $RUN \
  --out /tmp/stvd_art_tpu --platforms tpu --batch 1,32 --nbest \
  > "$OUT/export.log" 2>&1
tail -1 "$OUT/export.log" >> "$OUT/summary.txt"

echo "=== serving daemon E2E (http) ===" >> "$OUT/summary.txt"
nohup python -m stvd.cli.serve --artifact /tmp/stvd_art_tpu --port 8046 \
  --allow-shutdown > "$OUT/daemon.log" 2>&1 &
for i in $(seq 1 120); do   # warmup incl. 2 graph compiles can be slow
  curl -s localhost:8046/healthz > /dev/null 2>&1 && break
  sleep 5
done
python tools/probe_http_serving.py 8046 30 32 \
  > "$OUT/http.txt" 2> "$OUT/http.err"
tail -6 "$OUT/http.txt" >> "$OUT/summary.txt"
curl -s -X POST localhost:8046/shutdown >> "$OUT/summary.txt"
echo >> "$OUT/summary.txt"
sleep 10

echo "BATTERY_R4A_DONE" >> "$OUT/summary.txt"
