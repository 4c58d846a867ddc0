#!/bin/bash
# Battery r4b (round 4): the gates-kernel verdict + serving bench.
#   b1  gates+LSTM fused kernel A/B (tools/probe_gates_kernel.py):
#       tiny-shape compile canary, then reference-shape decode off/on
#       at bf16 and int8 (VERDICT r3 Next #2/#3, decode side)
#   b2  temporal flagship training (headline-shape config 3) — the
#       serving-bench model; spatial decode is ~600x slower (r4a)
#   b3  bench.py --what serve over the temporal run (battery 15's
#       repeatable form, VERDICT r3 Next #7)
#   b4  headline refresh WITH --pin-repo-cache (BENCH_r4 record)
# Sequential single-JAX-process chain; detached, no kill timeouts
# (SIGKILL/SIGTERM on a TPU client wedges the axon tunnel).
set -u
OUT=${1:-/tmp/battery_r4b}
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

echo "=== b1: gates-kernel A/B ===" >> "$OUT/summary.txt"
python tools/probe_gates_kernel.py 8 > "$OUT/gates.txt" 2> "$OUT/gates.err"
grep -E "tiny_parity|gates_kernel=|delta|DONE" "$OUT/gates.txt" >> "$OUT/summary.txt" || \
  tail -3 "$OUT/gates.err" >> "$OUT/summary.txt"

if [ ! -f data/msvd/bank.npz ]; then
  echo "=== regenerate corpus (tmp wiped?) ===" >> "$OUT/summary.txt"
  python tools/make_synthetic_corpus.py --recipe recipes/msvd.json \
    > "$OUT/corpus.log" 2>&1
  STVD_FORCE_CPU=1 python -m stvd.cli.convert \
    --features data/msvd/FEAT.pkl --regions data/msvd/REGIONS.pkl \
    --frames 28 --out data/msvd/bank.npz > "$OUT/convert.log" 2>&1
fi

echo "=== b2: train temporal flagship ($RUN) ===" >> "$OUT/summary.txt"
python -m stvd.cli.train --config runs/msvd_r2_long/config.json \
  --set model.use_spatial=false --set model.dim=3584 \
  --set model.dim_word=512 --set model.n_words=13056 \
  --set model.remat=false --set train.save_dir=$RUN \
  > "$OUT/train.log" 2>&1
tail -2 "$OUT/train.log" >> "$OUT/summary.txt"

echo "=== b2.5: regenerate msrvtt run + scores artifact (VERDICT #6) ===" >> "$OUT/summary.txt"
python tools/make_synthetic_corpus.py --recipe recipes/msrvtt.json \
  > "$OUT/msrvtt_corpus.log" 2>&1
STVD_FORCE_CPU=1 python -m stvd.cli.convert \
  --features data/msrvtt/FEAT.pkl --motion data/msrvtt/MOTION.pkl \
  --frames 28 --out data/msrvtt/bank.npz > "$OUT/msrvtt_convert.log" 2>&1
python -m stvd.cli.train --config runs/msrvtt/config.json \
  --set train.save_dir=runs/msrvtt > "$OUT/msrvtt_train.log" 2>&1
tail -2 "$OUT/msrvtt_train.log" >> "$OUT/summary.txt"
python -m stvd.cli.sample --run-dir runs/msrvtt --split test --best \
  > "$OUT/msrvtt_sample.log" 2>&1
tail -9 "$OUT/msrvtt_sample.log" >> "$OUT/summary.txt"

echo "=== b3: bench --what serve (temporal artifact, raw wire) ===" >> "$OUT/summary.txt"
python bench.py --what serve --run-dir $RUN --no-probe \
  > "$OUT/serve.json" 2> "$OUT/serve.err"
tail -1 "$OUT/serve.json" >> "$OUT/summary.txt"

echo "=== b4: headline refresh (--pin-repo-cache) ===" >> "$OUT/summary.txt"
python bench.py --iters 8 --pin-repo-cache > "$OUT/headline.json" 2> "$OUT/headline.err"
tail -1 "$OUT/headline.json" >> "$OUT/summary.txt"

echo "BATTERY_R4B_DONE" >> "$OUT/summary.txt"
