#!/bin/bash
# Battery r5a (round 5): regenerate corpus + retrain the two committed
# round-4 run dirs (VM wipe removes ckpts between rounds), then:
#   * test_scores.json for BOTH runs (VERDICT r4 Missing #5)
#   * the realistic-length trained decode headline next to the
#     EOS-suppressed worst case (VERDICT r4 next #3)
#   * re-pin the repo bench cache so the driver scoreboard carries the
#     round's records (VERDICT r4 next #1c: record batteries end by
#     refreshing the pin)
# Sequential single-JAX-process chain; detached, no kill timeouts
# (SIGKILL/SIGTERM on a TPU client wedges the axon tunnel).
set -u
OUT=${1:-/tmp/battery_r5a}
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

for RUN in runs/msvd_r4_temporal runs/msvd_r4_flagship; do
  echo "=== retrain $RUN ===" >> "$OUT/summary.txt"
  python -m stvd.cli.train --config $RUN/config.json \
    --set train.save_dir=$RUN > "$OUT/$(basename $RUN).train.log" 2>&1
  tail -3 "$OUT/$(basename $RUN).train.log" >> "$OUT/summary.txt"
  echo "=== score $RUN (test_scores.json) ===" >> "$OUT/summary.txt"
  python -m stvd.cli.sample --run-dir $RUN --split test \
    > "$OUT/$(basename $RUN).score.log" 2>&1
  tail -12 "$OUT/$(basename $RUN).score.log" >> "$OUT/summary.txt"
done

echo "=== trained decode headline (natural EOS vs worst case) ===" >> "$OUT/summary.txt"
python bench.py --trained runs/msvd_r4_temporal \
  --trained-bank data/msvd/bank.npz > "$OUT/trained_decode.json" 2> "$OUT/trained_decode.err"
tail -1 "$OUT/trained_decode.json" >> "$OUT/summary.txt"

echo "=== re-pin repo bench cache (records -> driver scoreboard) ===" >> "$OUT/summary.txt"
python bench.py --pin-repo-cache > "$OUT/pin.json" 2> "$OUT/pin.err"
tail -1 "$OUT/pin.json" >> "$OUT/summary.txt"

echo "BATTERY_R5A_DONE" >> "$OUT/summary.txt"
