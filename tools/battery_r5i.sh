#!/bin/bash
# Battery r5i (round 5): batch sweeps on the two rows with visible
# headroom — greedy decode (serial roofline ratio 1.4 vs beam's 1.13:
# fixed per-step overhead amortizes over less work, so a larger batch
# may close it) and fast-profile training (bf16 slots measured only at
# b=256; b=384/512 may keep scaling or spill like decode does at 512).
set -u
OUT=${1:-/tmp/battery_r5i}
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

echo "=== greedy batch sweep (bf16 + int8) ===" >> "$OUT/summary.txt"
python - << 'EOF' > "$OUT/greedy_sweep.json" 2> "$OUT/greedy_sweep.err"
import json
from bench import bench_greedy
for quant in ("none", "int8"):
    for b in (1024, 2048, 4096):
        cps, per = bench_greedy(True, iters=16, batch=b, quant=quant)
        print(json.dumps({"quant": quant, "batch": b,
                          "greedy_cps": round(cps, 2),
                          "batch_ms": round(per * 1e3, 2)}), flush=True)
EOF
cat "$OUT/greedy_sweep.json" >> "$OUT/summary.txt"

echo "=== preset-3 train batch sweep (bf16 slots) ===" >> "$OUT/summary.txt"
for b in 256 384 512; do
  python bench.py --what train --preset 3 --opt-slots bfloat16 \
    --batch $b --iters 6 > "$OUT/train_b$b.json" 2> "$OUT/train_b$b.err"
  tail -1 "$OUT/train_b$b.json" >> "$OUT/summary.txt"
done

echo "BATTERY_R5I_DONE" >> "$OUT/summary.txt"
