"""Island probe: the adadelta+clip update at config-2 scale (95 M
params x 3 f32 slots), measured 6.9 ms standalone in the round-3 island
table vs a ~4.2 ms traffic floor (params r/w 0.76 GB + 2 slots r/w
1.52 GB + grads read 0.38 GB + clip's extra grads r/w 0.76 GB at
820 GB/s).  Variants isolate where the slack is:

  a. production: optax.chain(clip_by_global_norm, adadelta)
  b. no clip:    optax.adadelta alone (is the clip stage's
                 materialized clipped-grads tree an extra 0.76 GB?)
  c. fused:      hand-written single tree_map pass with the clip scale
                 folded into the adadelta elementwise chain (the
                 clipped tree never exists even structurally)

If a ~= b + 0.9 ms and c ~= b, the win is a fused transform; if
a ~= b ~= c, XLA already fuses across the optax stage boundary and the
6.9 ms is dispatch / small-leaf overhead (negative result, record).

Round-3 follow-up variants (a/b/c measured 10.29/9.80/9.71 ms — optax
already fused; but the ~3.2 ms traffic floor says 3x slack remains):

  d. flat:       identical math on ONE concatenated f32 vector per
                 tree (params/grads/acc/acc_delta pre-flattened) —
                 isolates per-leaf kernel/dispatch overhead
  e. triad:      jnp-level streaming ceiling over the same byte
                 volume (reads 4 vectors, writes 3) — the achievable-
                 bandwidth denominator for d"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import optax

from stvd.config import preset
from stvd.model.decoder import init_params


def timeit(name, fn, *args, iters=8, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:24s}: {best*1e3:7.3f} ms", flush=True)


def main():
    mcfg = preset("2").model
    params = init_params(jax.random.PRNGKey(0), mcfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f} M, {len(jax.tree.leaves(params))} leaves",
          flush=True)
    grads = jax.tree.map(
        lambda x: 0.01 * jnp.ones_like(x, jnp.float32), params)

    # a. production chain
    opt_a = optax.chain(optax.clip_by_global_norm(10.0),
                        optax.adadelta(learning_rate=1.0))
    st_a = opt_a.init(params)

    @jax.jit
    def step_a(grads, st, params):
        up, st2 = opt_a.update(grads, st, params)
        return optax.apply_updates(params, up), st2

    # b. no clip
    opt_b = optax.adadelta(learning_rate=1.0)
    st_b = opt_b.init(params)

    @jax.jit
    def step_b(grads, st, params):
        up, st2 = opt_b.update(grads, st, params)
        return optax.apply_updates(params, up), st2

    # c. fused single pass (adadelta defaults: rho=0.9, eps=1e-6)
    rho, eps, lr, clip_c = 0.9, 1e-6, 1.0, 10.0

    @jax.jit
    def step_c(grads, acc, acc_delta, params):
        gnorm = optax.global_norm(grads)
        scale = jnp.where(gnorm < clip_c, 1.0, clip_c / gnorm)

        def upd(g, a, ad, p):
            g = g * scale
            a2 = rho * a + (1 - rho) * g * g
            u = g * jnp.sqrt(ad + eps) / jnp.sqrt(a2 + eps)
            ad2 = rho * ad + (1 - rho) * u * u
            return p - lr * u, a2, ad2

        out = jax.tree.map(upd, grads, acc, acc_delta, params)
        p2 = jax.tree.map(lambda t: t[0], out,
                          is_leaf=lambda t: isinstance(t, tuple))
        a2 = jax.tree.map(lambda t: t[1], out,
                          is_leaf=lambda t: isinstance(t, tuple))
        ad2 = jax.tree.map(lambda t: t[2], out,
                           is_leaf=lambda t: isinstance(t, tuple))
        return p2, a2, ad2

    acc = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
    acc_d = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)

    timeit("a chain(clip, adadelta)", step_a, grads, st_a, params)
    timeit("b adadelta only", step_b, grads, st_b, params)
    timeit("c fused single pass", step_c, grads, acc, acc_d, params)

    # d. the same math on ONE flat f32 vector per tree
    gf = jnp.concatenate([x.reshape(-1) for x in jax.tree.leaves(grads)])
    pf = jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                          for x in jax.tree.leaves(params)])
    af = jnp.zeros_like(pf)
    adf = jnp.zeros_like(pf)

    @jax.jit
    def step_d(g, a, ad, p):
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.where(gnorm < clip_c, 1.0, clip_c / gnorm)
        a2 = rho * a + (1 - rho) * g * g
        u = g * jnp.sqrt(ad + eps) / jnp.sqrt(a2 + eps)
        ad2 = rho * ad + (1 - rho) * u * u
        return p - lr * u, a2, ad2

    timeit("d flat single vector", step_d, gf, af, adf, pf)

    # e. streaming ceiling: same traffic pattern (4 reads, 3 writes)
    @jax.jit
    def step_e(g, a, ad, p):
        return p - 1e-3 * g, a + 1e-3 * g, ad + 1e-3 * a
    timeit("e triad r4w3 ceiling", step_e, gf, af, adf, pf)
    nb = pf.size * 4
    print(f"   (triad bytes/iter: {7 * nb / 1e9:.2f} GB)", flush=True)
    print("DONE_OPT", flush=True)


if __name__ == "__main__":
    main()
