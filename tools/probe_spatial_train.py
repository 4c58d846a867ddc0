"""Island decomposition of config-2 (spatial) training on v5e.

Measured context (round 3): fused spatial VJP = 143 ms/step (6.99
steps/s, mfu 0.082) vs autodiff+remat 207 ms/step.  The cost-model
floor is far lower, so something lowers badly.  Suspect #1: the
spatial einsums contract over R=49 with batch dims (B,K) — if XLA
lowers them as batched M=1 dot_generals the MXU runs at a few percent
utilization; the mul+reduce formulation keeps them on the VPU.

Islands measured here (reference scale B=64 K=28 R=49 s=Dr=1024 bf16):
  per-op duels   einsum-dot vs mul-reduce for the three R-contractions
  tanh-gen       materializing tanh(pregion + h) (the 92M-element op)
  fwd-scan       the fused forward scan alone (primal)
  full-step      value_and_grad wgrad f32 vs bf16 (Dpe accumulator)
  dws-gemm       the post-scan dWs_att GEMM (regions^T @ dpregion)

Protocol: >=8 pipelined invocations per value-transfer sync; ops run
inside a lax.scan with a serial carry where hoisting is a risk.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B, K, R, S = 64, 28, 49, 1024
DR = S
T = 30


def timed(fn, *args, iters=8, reps=1):
    """Mean seconds per invocation (pipelined, one sync)."""
    out = fn(*args)
    jax.tree.map(lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape")
                 else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape")
                 else x, out)
    return (time.perf_counter() - t0) / iters / reps


def scan_op(op, n=T):
    """Run op inside a serial-carry scan n times (defeats CSE/hoist):
    the carry perturbs the input each iteration."""
    @jax.jit
    def run(x, *consts):
        def body(c, _):
            y = op(x + c, *consts)
            return c + y.reshape(-1)[:1].astype(c.dtype) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros((1,), x.dtype), None, length=n)
        return c
    return run


def main():
    cd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(rng, 16))
    alpha = jax.nn.softmax(jax.random.normal(next(ks), (B, K, R)), axis=-1)
    regions = (0.1 * jax.random.normal(next(ks), (B, K, R, DR))).astype(cd)
    pregion = (0.1 * jax.random.normal(next(ks), (B, K, R, S))).astype(cd)
    h_satt = (0.1 * jax.random.normal(next(ks), (B, S))).astype(cd)
    u_s = (0.1 * jax.random.normal(next(ks), (S,))).astype(cd)
    dspat = (0.1 * jax.random.normal(next(ks), (B, K, DR))).astype(cd)
    e_s = jnp.tanh(pregion)

    duels = {
        "spat_einsum_dot": (lambda a, r: jnp.einsum("bkr,bkrd->bkd",
                                                    a.astype(cd), r),
                            alpha, regions),
        "spat_mul_reduce": (lambda a, r: (a.astype(cd)[..., None] * r
                                          ).sum(axis=2),
                            alpha, regions),
        "escore_einsum_dot": (lambda e, u: jnp.einsum("bkrd,d->bkr", e, u),
                              e_s, u_s),
        "escore_mul_reduce": (lambda e, u: (e * u).sum(axis=-1),
                              e_s, u_s),
        "dalpha_einsum_dot": (lambda d, r: jnp.einsum("bkd,bkrd->bkr",
                                                      d, r),
                              dspat, regions),
        "dalpha_mul_reduce": (lambda d, r: (d[:, :, None, :] * r
                                            ).sum(axis=-1),
                              dspat, regions),
        "tanh_gen": (lambda p, h: jnp.tanh(p + h[:, None, None, :]),
                     pregion, h_satt),
        "fused_gen_score": (lambda p, h, u: jnp.einsum(
            "bkrd,d->bkr", jnp.tanh(p + h[:, None, None, :]), u),
            pregion, h_satt, u_s),
    }
    for name, (op, *args) in duels.items():
        dt = timed(scan_op(op), *args, reps=T)
        print(f"{name}: {dt * 1e3:.4f} ms/op", flush=True)

    # post-scan dWs_att GEMM: regions^T @ dpregion over B*K*R rows
    rf = regions.reshape(-1, DR)
    df = pregion.reshape(-1, S)

    @jax.jit
    def dws(rf, df):
        return jnp.dot(rf.T, df, preferred_element_type=jnp.float32)

    print(f"dws_gemm_184gflop: {timed(dws, rf, df) * 1e3:.3f} ms",
          flush=True)

    # forward scan alone (the custom-vjp primal)
    from stvd.config import preset
    from stvd.model import seqgrad
    from stvd.model.decoder import init_params
    from stvd.model.step import precompute, init_state, cast_params
    import dataclasses

    cfg0 = preset("2")
    mcfg = cfg0.model
    params = init_params(jax.random.PRNGKey(1), mcfg)
    frames = (0.1 * jax.random.normal(next(ks), (B, K, mcfg.ctx_dim))
              ).astype(cd)
    fmask = jnp.ones((B, K))
    x_pre = (0.1 * jax.random.normal(next(ks), (T, B, 4 * mcfg.dim))
             ).astype(jnp.float32)

    @jax.jit
    def fwd(params, frames, regions, x_pre):
        p = cast_params(params, mcfg)
        sc = precompute(p, mcfg, frames, fmask, regions)
        st = init_state(p, mcfg, sc)
        hs, ctxs, alphas = seqgrad.run_spatial(p, mcfg, sc, st, x_pre)
        return hs.sum()

    print(f"fwd_scan_total: {timed(fwd, params, frames, regions, x_pre, iters=6) * 1e3:.2f} ms",
          flush=True)

    # full value_and_grad at both wgrad dtypes
    from stvd.train.loss import loss_fn
    tokens = jax.random.randint(next(ks), (B, T), 0, mcfg.n_words)
    batch = {"frames": frames, "frame_mask": fmask, "regions": regions,
             "tokens": tokens, "token_mask": jnp.ones((B, T)),
             "weight": jnp.ones((B,))}
    for wg in ("float32", "bfloat16"):
        m = dataclasses.replace(mcfg, wgrad_dtype=wg)

        @jax.jit
        def step(params, batch):
            g = jax.grad(lambda p: loss_fn(p, m, batch, train=False)[0]
                         )(params)
            return g["U"].reshape(-1)[:1]

        print(f"grad_step_wgrad_{wg}: "
              f"{timed(step, params, batch, iters=6) * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
