"""Measure wgrad_dtype effect on the spatial Dpe accumulator with ALL
grads consumed (probe-1's comparison was invalid: consuming only g[U]
let XLA DCE the Dpe path entirely on both sides)."""
import sys, time
sys.path.insert(0, ".")
import dataclasses
import jax, jax.numpy as jnp
import optax
from stvd.config import preset
from stvd.train.loss import loss_fn
from stvd.model.decoder import init_params

B, K, T = 64, 28, 30

def main():
    cfg = preset("2")
    mcfg = cfg.model
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 8))
    cd = jnp.bfloat16
    params = init_params(jax.random.PRNGKey(1), mcfg)
    batch = {"frames": (0.1*jax.random.normal(next(ks), (B,K,mcfg.ctx_dim))).astype(cd),
             "frame_mask": jnp.ones((B,K)),
             "regions": (0.1*jax.random.normal(next(ks), (B,K,mcfg.n_regions,mcfg.region_dim))).astype(cd),
             "tokens": jax.random.randint(next(ks), (B,T), 0, mcfg.n_words),
             "token_mask": jnp.ones((B,T)), "weight": jnp.ones((B,))}
    for wg in ("float32", "bfloat16"):
        m = dataclasses.replace(mcfg, wgrad_dtype=wg)
        @jax.jit
        def g_all(params, batch):
            g = jax.grad(lambda p: loss_fn(p, m, batch, train=True,
                                           rng=jax.random.PRNGKey(3))[0])(params)
            return optax.global_norm(g).reshape(1)
        float(g_all(params, batch)[0])
        t0 = time.perf_counter()
        for _ in range(6):
            out = g_all(params, batch)
        float(out[0])
        print(f"grad_all_wgrad_{wg}: {(time.perf_counter()-t0)/6*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
