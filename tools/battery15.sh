#!/bin/bash
# Battery 15 (round 3): HTTP serving daemon E2E on the chip — export a
# bucketed (1, 32) TPU artifact from the spatial flagship run, start
# cli/serve, measure client-observed b=1 latency and bulk throughput
# (tools/probe_http_serving.py), then stop via POST /shutdown
# (signal-free: signals on a TPU client can wedge the axon tunnel).
# Chained after battery 14.  Detached-run, no kill timeouts.
set -u
OUT=${1:-/tmp/battery15}
B14=${2:-/tmp/battery14/summary.txt}
mkdir -p "$OUT"
cd /root/repo

for i in $(seq 1 80); do
  grep -q BATTERY14_DONE "$B14" 2>/dev/null && break
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

echo "=== export TPU artifact (batch 1,32, nbest) ===" >> "$OUT/summary.txt"
python -m stvd.cli.export --run-dir runs/msvd_r2_long \
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

echo "BATTERY15_DONE" >> "$OUT/summary.txt"
