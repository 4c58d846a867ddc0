#!/bin/bash
# Battery r5d (round 5): serving SOAK (VERDICT r4 next #8) — 10k-ish
# sustained requests against the HTTP daemon over a TPU artifact with a
# resident bank: windowed p50/p95 drift, daemon RSS, /stats bounds, one
# mid-run weight swap (POST /swap_params) and one cold-bucket hit.
# Requires battery r5a first (trained runs + data/msvd/bank.npz).
set -u
OUT=${1:-/tmp/battery_r5d}
RUN=runs/msvd_r4_temporal
ART=/tmp/stvd_art_soak
PORT=8053
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

echo "=== swap weights npz (the run's LAST ckpt vs ckpt_best) ===" >> "$OUT/summary.txt"
STVD_FORCE_CPU=1 python - "$RUN" "$OUT/swap_weights.npz" <<'EOF' >> "$OUT/summary.txt" 2>&1
import sys
import numpy as np
sys.path.insert(0, ".")
from stvd.api import Captioner
cap = Captioner.from_run_dir(sys.argv[1], best=False)
np.savez(sys.argv[2], **{k: np.asarray(v) for k, v in cap.params.items()})
print("swap npz:", sys.argv[2], len(cap.params), "params")
EOF

echo "=== export soak artifact (b 1,32 + cold bucket 7) ===" >> "$OUT/summary.txt"
python -m stvd.cli.export --run-dir $RUN --out $ART \
  --platforms tpu --batch 1,7,32 > "$OUT/export.log" 2>&1
tail -1 "$OUT/export.log" >> "$OUT/summary.txt"

echo "=== launch daemon (bank-resident, swap enabled) ===" >> "$OUT/summary.txt"
nohup python -m stvd.cli.serve --artifact $ART --port $PORT \
  --bank data/msvd/bank.npz --allow-swap --allow-shutdown \
  > "$OUT/daemon.log" 2>&1 &
DPID=$!
echo "daemon pid $DPID" >> "$OUT/summary.txt"
for i in $(seq 1 120); do
  curl -s localhost:$PORT/healthz > /dev/null 2>&1 && break
  sleep 5
done
# warm the b=1 and b=32 id buckets (NOT b=7 — that's the cold hit)
curl -s -X POST localhost:$PORT/caption_ids \
  -d '{"ids": ["vid0000"]}' > /dev/null
python - "$PORT" <<'EOF' > /dev/null 2>&1
import json, sys, http.client
port = int(sys.argv[1])
conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
conn.request("GET", "/manifest"); ids = json.loads(conn.getresponse().read())["bank_ids"]
conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
conn.request("POST", "/caption_ids", body=json.dumps({"ids": (ids * 32)[:32]}),
             headers={"Content-Type": "application/json"})
conn.getresponse().read()
EOF

echo "=== soak: 9k ids b=1 + bulk bursts + 500 raw-wire + swap + cold ===" >> "$OUT/summary.txt"
python tools/soak_serving.py --port $PORT --pid $DPID \
  --ids-total 9000 --wire-total 500 --swap "$OUT/swap_weights.npz" \
  --cold-n 7 --out runs/soak_r5.json > "$OUT/soak.log" 2>&1
tail -3 "$OUT/soak.log" >> "$OUT/summary.txt"

curl -s -X POST localhost:$PORT/shutdown >> "$OUT/summary.txt"
echo >> "$OUT/summary.txt"
sleep 10
echo "BATTERY_R5D_DONE" >> "$OUT/summary.txt"
