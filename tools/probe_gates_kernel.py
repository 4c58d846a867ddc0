"""Gates+LSTM fused-kernel A/B on hardware (round 4, VERDICT r3 #2/#3).

Stages, deliberately ordered safest-first (a Mosaic failure at full
scale is cheaper to diagnose after the tiny shape compiled):
  1. tiny aligned shape (dim 128): compile + parity vs the jnp step,
     bf16 and int8 — catches int8-MXU/Mosaic lowering issues cheaply;
  2. reference-shape decode A/B via bench.bench_decode (batch 384,
     beam 5): gates_kernel off vs on, bf16 and int8.

Usage: python tools/probe_gates_kernel.py [ITERS]
One JAX process only (machine rule).  Clean exceptions exit 1 — never
leave a hung TPU client behind.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def tiny_parity():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stvd.config import ModelConfig
    from stvd.model import kernel as kmod
    from stvd.model import step as smod
    from stvd.model.decoder import init_params
    from stvd.model.step import init_state, precompute

    for quant in ("none", "int8"):
        cfg = ModelConfig(n_words=64, dim_word=16, dim=128, ctx_dim=128,
                          n_frames=6, compute_dtype="bfloat16",
                          use_dropout=False, gates_kernel="on",
                          decode_quant=quant)
        params = init_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.RandomState(0)
        ctx = jnp.asarray(rng.randn(4, 6, 128) * 0.5, jnp.float32)
        mask = jnp.ones((4, 6), jnp.float32)
        sc = precompute(params, cfg, ctx, mask)
        state = init_state(params, cfg, sc)
        emb = jnp.asarray(rng.randn(4, 16) * 0.5, jnp.float32)
        ref = smod.step(params, cfg, state, sc, emb)
        got = smod.step_with_core(params, cfg, state, sc, emb,
                                  gates_core=kmod.gates_lstm_pallas)
        err = float(jnp.max(jnp.abs(got.h - ref.h)))
        print(f"tiny_parity quant={quant}: max|dh|={err:.3e} "
              f"{'OK' if err < 2e-2 else 'FAIL'}", flush=True)
        if err >= 2e-2:
            raise SystemExit(1)


def reference_ab():
    import bench

    for quant in ("none", "int8"):
        row = {}
        for gk in ("off", "on"):
            t0 = time.perf_counter()
            cps, pb = bench.bench_decode(False, True, ITERS, batch=384,
                                         quant=quant, gates_kernel=gk)
            row[gk] = cps
            print(f"beam5 b=384 quant={quant} gates_kernel={gk}: "
                  f"{cps:.1f} captions/s ({pb * 1e3:.2f} ms/batch; "
                  f"wall {time.perf_counter() - t0:.0f}s)", flush=True)
        delta = (row["on"] - row["off"]) / row["off"] * 100
        print(f"gates-kernel delta quant={quant}: {delta:+.1f}%",
              flush=True)


def main():
    import jax
    from stvd.utils import enable_compile_cache
    enable_compile_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    tiny_parity()
    reference_ab()
    print("GATES_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
