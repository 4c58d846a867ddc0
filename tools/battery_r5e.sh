#!/bin/bash
# Battery r5e (round 5): productize the fast training profile
# (VERDICT r4 next #5 / Weak #3).  recipes/msvd_fast.json = the base
# recipe with batch_size 256 + bf16 adadelta slots (both measured wins
# in round 3/4 batteries but never productized).  This battery:
#   1. measures preset-3 train throughput at the fast profile
#      (b=256 + bf16 slots) next to the default profile,
#   2. trains recipes/msvd.json AND recipes/msvd_fast.json end-to-end
#      on the same corpus and compares final test scores (the
#      convergence-class pin: fast must land in the same score class),
#   3. records examples/s for both fits.
# Requires battery r5a's corpus (data/msvd) — or regenerates it.
set -u
OUT=${1:-/tmp/battery_r5e}
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

if [ ! -f data/msvd/bank.npz ]; then
  echo "=== regenerate corpus (r5a not run yet) ===" >> "$OUT/summary.txt"
  python tools/make_synthetic_corpus.py --recipe recipes/msvd.json \
    > "$OUT/corpus.log" 2>&1
  STVD_FORCE_CPU=1 python -m stvd.cli.convert \
    --features data/msvd/FEAT.pkl --regions data/msvd/REGIONS.pkl \
    --frames 28 --out data/msvd/bank.npz >> "$OUT/corpus.log" 2>&1
fi

echo "=== preset-3 train: default vs fast profile ===" >> "$OUT/summary.txt"
python bench.py --preset 3 --what train --iters 6 \
  > "$OUT/p3_default.json" 2> "$OUT/p3_default.err"
tail -1 "$OUT/p3_default.json" >> "$OUT/summary.txt"
python bench.py --preset 3 --what train --iters 6 --batch 256 \
  --opt-slots bfloat16 > "$OUT/p3_fast.json" 2> "$OUT/p3_fast.err"
tail -1 "$OUT/p3_fast.json" >> "$OUT/summary.txt"

echo "=== fit base recipe (runs/msvd) ===" >> "$OUT/summary.txt"
python -m stvd.cli.train --config recipes/msvd.json \
  > "$OUT/base.train.log" 2>&1
tail -3 "$OUT/base.train.log" >> "$OUT/summary.txt"
python -m stvd.cli.sample --run-dir runs/msvd --split test \
  > "$OUT/base.score.log" 2>&1
tail -12 "$OUT/base.score.log" >> "$OUT/summary.txt"

echo "=== fit fast recipe (runs/msvd_fast) ===" >> "$OUT/summary.txt"
python -m stvd.cli.train --config recipes/msvd_fast.json \
  > "$OUT/fast.train.log" 2>&1
tail -3 "$OUT/fast.train.log" >> "$OUT/summary.txt"
python -m stvd.cli.sample --run-dir runs/msvd_fast --split test \
  > "$OUT/fast.score.log" 2>&1
tail -12 "$OUT/fast.score.log" >> "$OUT/summary.txt"

echo "BATTERY_R5E_DONE" >> "$OUT/summary.txt"
