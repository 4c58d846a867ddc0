"""Follow-up: close the 143ms(bench) vs 65ms(probe-1) gap.

Probe-1's grad step consumed only g["U"], DCE-ing the other gradient
paths (Wemb scatter, vocab-matmul backward, dWs_att GEMM, ...).  This
probe consumes ALL grads (global norm), times the optimizer island,
the full production train step, and ablates the Wemb scatter.
"""
import sys, time
sys.path.insert(0, ".")
import dataclasses
import jax, jax.numpy as jnp
import optax

from stvd.config import preset
from stvd.train.loss import loss_fn
from stvd.train.loop import init_train_state, make_train_step
from stvd.model.decoder import init_params

B, K, T = 64, 28, 30

def timed(fn, *args, iters=6):
    out = fn(*args); jax.tree.map(lambda x: float(x.reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(x.reshape(-1)[0]), out)
    return (time.perf_counter() - t0) / iters

def main():
    cfg = preset("2")
    mcfg, tcfg = cfg.model, cfg.train
    rng = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(rng, 8))
    cd = jnp.bfloat16
    params = init_params(jax.random.PRNGKey(1), mcfg)
    frames = (0.1 * jax.random.normal(next(ks), (B, K, mcfg.ctx_dim))).astype(cd)
    regions = (0.1 * jax.random.normal(next(ks), (B, K, mcfg.n_regions, mcfg.region_dim))).astype(cd)
    tokens = jax.random.randint(next(ks), (B, T), 0, mcfg.n_words)
    batch = {"frames": frames, "frame_mask": jnp.ones((B, K)),
             "regions": regions, "tokens": tokens,
             "token_mask": jnp.ones((B, T)), "weight": jnp.ones((B,))}

    @jax.jit
    def grad_all(params, batch):
        g = jax.grad(lambda p: loss_fn(p, mcfg, batch, train=True,
                                       rng=jax.random.PRNGKey(3))[0])(params)
        return optax.global_norm(g).reshape(1)
    print(f"grad_all_consumed: {timed(grad_all, params, batch)*1e3:.2f} ms", flush=True)

    # freeze Wemb: cost of the embedding scatter backward
    @jax.jit
    def grad_no_emb(params, batch):
        def loss(p):
            p = dict(p); p["Wemb"] = jax.lax.stop_gradient(p["Wemb"])
            return loss_fn(p, mcfg, batch, train=True,
                           rng=jax.random.PRNGKey(3))[0]
        g = jax.grad(loss)(params)
        return optax.global_norm(g).reshape(1)
    print(f"grad_no_emb_scatter: {timed(grad_no_emb, params, batch)*1e3:.2f} ms", flush=True)

    # no spatial grads: stop_gradient the spatial leaves (scan cost only)
    @jax.jit
    def grad_no_spatial_w(params, batch):
        def loss(p):
            p = dict(p)
            for k in ("Ws_att", "bs_att"):
                p[k] = jax.lax.stop_gradient(p[k])
            return loss_fn(p, mcfg, batch, train=True,
                           rng=jax.random.PRNGKey(3))[0]
        g = jax.grad(loss)(params)
        return optax.global_norm(g).reshape(1)
    print(f"grad_no_dWs_gemm: {timed(grad_no_spatial_w, params, batch)*1e3:.2f} ms", flush=True)

    # optimizer island: adadelta update alone
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    g0 = jax.tree.map(lambda x: (0.01 * x).astype(x.dtype), state["params"])
    opt = optax.chain(optax.clip_by_global_norm(tcfg.clip_c),
                      optax.adadelta(learning_rate=tcfg.lr))
    ost = opt.init(state["params"])
    @jax.jit
    def opt_step(p, ost, g):
        u, ost2 = opt.update(g, ost, p)
        p2 = optax.apply_updates(p, u)
        return p2["U"].reshape(-1)[:1]
    print(f"adadelta_update: {timed(opt_step, state['params'], ost, g0)*1e3:.2f} ms", flush=True)

    # the full production train step (should reproduce bench's 143 ms)
    step = make_train_step(mcfg, tcfg)
    state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(6):
        state, m = step(state, batch)
    float(m["loss"])
    print(f"full_train_step: {(time.perf_counter()-t0)/6*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
