"""Island decomposition of preset-3 (temporal, headline) training.

Round-2 weak #3: the 27.9 ms train step (35.8 steps/s, train_mfu 0.18)
never got the per-island rigor that decode and config-2 training got.
This probe splits it (reference scale: dim 3584, vocab 13056, b=64,
T=30, bf16 compute, fused sequence VJP):

  full_step      production make_train_step (grad + adadelta + clip)
  grad_only      value_and_grad of loss_fn, ALL grad leaves consumed
                 (consuming one grad lets XLA DCE whole backward paths
                 — the round-3 probe-1 trap)
  loss_only      forward only (loss value)
  opt_only       optimizer update standalone (expected ~10 ms from
                 probe_optimizer at config-2 scale — preset 3 has a
                 different param count, so re-measured here)
  ablations      stop_gradient on (a) Wemb (scatter-add wgrad),
                 (b) ff_logit_* (the (T*B, dim) x (dim, vocab) wgrad
                 GEMM pair), (c) the attention params — each re-runs
                 grad_only with that island removed

full_step ~= grad_only + opt_only validates the decomposition; the
ablation deltas size the wgrad islands.  Protocol: 6-8 pipelined
invocations per value-transfer sync (CLAUDE.md measurement rules).
Reference: the theano train graph (`model_attention.py:§train` —
SURVEY.md §3.2).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax


def timed(fn, *args, iters=8, rounds=3):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import bench
    from stvd.config import preset
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn
    from stvd.train.loop import init_train_state, make_train_step
    from stvd.train.loss import loss_fn

    cfg = preset("3")
    mcfg, tcfg = cfg.model, cfg.train
    step_fn = get_step_fn(None)
    batch = bench._batch(mcfg, tcfg, tcfg.batch_size)
    batch["weight"] = batch["token_mask"][:, 0]

    n = None

    # 1. full production step
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    n = sum(x.size for x in jax.tree.leaves(state["params"]))
    print(f"params: {n / 1e6:.1f} M", flush=True)
    step = make_train_step(mcfg, tcfg, step_fn=step_fn)

    def full(state, batch):
        state, m = step(state, batch)
        return state, m

    # time with explicit loop keeping state threading (donated buffers)
    st, m = step(state, batch)
    float(m["loss"])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            st, m = step(st, batch)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"full_step: {best * 1e3:.2f} ms", flush=True)

    params = init_params(jax.random.PRNGKey(0), mcfg)
    rng = jax.random.PRNGKey(1)

    def make_grad(stops=()):
        @jax.jit
        def g(params, batch):
            def obj(p):
                p = {k: (jax.lax.stop_gradient(v) if any(
                    k.startswith(s) for s in stops) else v)
                    for k, v in p.items()}
                return loss_fn(p, mcfg, batch, rng=rng, train=True,
                               ss_prob=tcfg.ss_prob, step_fn=step_fn)[0]
            gr = jax.grad(obj)(params)
            # consume EVERY leaf (DCE trap)
            return sum(x.reshape(-1)[0].astype(jnp.float32)
                       for x in jax.tree.leaves(gr))
        return g

    t_grad = timed(make_grad(), params, batch, iters=6)
    print(f"grad_only: {t_grad * 1e3:.2f} ms", flush=True)

    @jax.jit
    def lonly(params, batch):
        return loss_fn(params, mcfg, batch, rng=rng, train=True,
                       ss_prob=tcfg.ss_prob, step_fn=step_fn)[0]

    print(f"loss_only: {timed(lonly, params, batch, iters=6) * 1e3:.2f} ms",
          flush=True)

    # optimizer standalone at THIS param count
    from stvd.train.loop import make_optimizer
    opt = make_optimizer(tcfg)
    ost = opt.init(params)
    grads = jax.tree.map(lambda x: 0.01 * jnp.ones_like(x, jnp.float32),
                         params)

    @jax.jit
    def opt_only(grads, ost, params):
        up, ost2 = opt.update(grads, ost, params)
        return optax.apply_updates(params, up), ost2

    print(f"opt_only: {timed(opt_only, grads, ost, params) * 1e3:.2f} ms",
          flush=True)

    for name, stops in (("no_Wemb", ("Wemb",)),
                        ("no_logit", ("ff_logit",)),
                        ("no_attn", ("U_att", "c_att", "Wc_att", "b_att"))):
        t = timed(make_grad(stops), params, batch, iters=6)
        print(f"grad_{name}: {t * 1e3:.2f} ms (delta "
              f"{(t_grad - t) * 1e3:+.2f})", flush=True)

    # ---- forward sub-islands: scan body vs logit/CE tail ----
    from stvd.model import seqgrad
    from stvd.model import step as step_mod
    from stvd.model.step import cast_params, init_state, precompute
    cd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @jax.jit
    def fwd_scan(params, batch):
        p = cast_params(params, mcfg)
        sc = precompute(p, mcfg, batch["frames"], batch["frame_mask"],
                        batch.get("regions"))
        st = init_state(p, mcfg, sc)
        emb_all = p["Wemb"][batch["tokens"]]
        emb_in = jnp.concatenate(
            [jnp.zeros_like(emb_all[:, :1]), emb_all[:, :-1]], axis=1)
        x_pre = step_mod._dot(emb_in, p["W"], jnp.dtype(mcfg.compute_dtype)
                              ) + p["b"]
        hs, ctxs, alphas = seqgrad.run(p, mcfg, sc, st,
                                       jnp.swapaxes(x_pre, 0, 1))
        return hs.reshape(-1)[0]

    print(f"fwd_scan_only: "
          f"{timed(fwd_scan, params, batch, iters=6) * 1e3:.2f} ms",
          flush=True)

    # ---- achievable READ-ONLY bandwidth (weight-streaming anchor):
    # serial-carry scan over 30 reads of a W-gates-sized bf16 array ----
    w = jnp.ones((mcfg.dim, 4 * mcfg.dim), cd)
    nb = w.size * w.dtype.itemsize

    @jax.jit
    def read30(w):
        def body(c, _):
            return c + jnp.sum(w, dtype=jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=30)
        return c

    t = timed(read30, w)
    print(f"read_stream_30x{nb / 1e6:.0f}MB: {t * 1e3:.2f} ms "
          f"({30 * nb / t / 1e9:.0f} GB/s read-only)", flush=True)
    print("DONE_TEMPORAL", flush=True)


if __name__ == "__main__":
    main()
