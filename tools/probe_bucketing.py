"""Measure length-bucketed training throughput (examples/s) on TPU.

Realistic MSVD-like caption lengths (4-9 tokens incl. EOS vs maxlen
30): the unbucketed iterator pads every batch to T=30; buckets "10,30"
put ~all captions in the T=10 executable.  Temporal reference scale
(preset 3 model), batch 64, epoch-level wall clock after compile
warmup for every bucket shape.
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

from stvd.config import preset
from stvd.data.batching import (BatchIterator, BucketedBatchIterator,
                                gather_batch, synthetic_dataset)
from stvd.train.loop import init_train_state, make_train_step

def main():
    cfg = preset("3")
    mcfg, tcfg = cfg.model, cfg.train
    ds = synthetic_dataset(n_videos=512, captions_per_video=2,
                           k=mcfg.n_frames, d=mcfg.ctx_dim,
                           maxlen=tcfg.maxlen, seed=0)
    dev = ds.bank.to_device(dtype=jnp.dtype(mcfg.compute_dtype))
    lens = ds.captions.mask.sum(axis=1).astype(np.int64)
    print(f"caption lengths: min {lens.min()} max {lens.max()} "
          f"mean {lens.mean():.1f} (maxlen {tcfg.maxlen})", flush=True)
    step = make_train_step(mcfg, tcfg)
    n = ds.captions.n

    def run_epochs(it_factory, label, epochs=3):
        # fresh state per variant: the train step DONATES its state
        # buffers (reusing a donated array raises 'Array has been
        # deleted')
        state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        # warmup epoch (compiles every bucket shape)
        for item in it_factory().epoch():
            idx, w = item[0], item[1]
            t_b = item[2] if len(item) == 3 else 0
            b = gather_batch(dev, ds.captions, idx, seq_len=t_b)
            b["weight"] = jnp.asarray(w)
            state, m = step(state, b)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(epochs):
            it = it_factory()
            for item in it.epoch():
                idx, w = item[0], item[1]
                t_b = item[2] if len(item) == 3 else 0
                b = gather_batch(dev, ds.captions, idx, seq_len=t_b)
                b["weight"] = jnp.asarray(w)
                state, m = step(state, b)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / epochs
        print(f"{label}: {n / dt:.1f} examples/s ({dt:.3f} s/epoch)",
              flush=True)

    run_epochs(lambda: BatchIterator(n, tcfg.batch_size, seed=1),
               "unbucketed(T=30)")
    run_epochs(lambda: BucketedBatchIterator(lens, tcfg.batch_size,
                                             (10, 20, 30), seed=1),
               "bucketed(10,20,30)")

if __name__ == "__main__":
    main()
