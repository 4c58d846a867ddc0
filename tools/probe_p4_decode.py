"""Island decomposition of preset-4 (MSR-VTT dual-stream) beam decode.

Round-3 context: preset 4 measured 776 captions/s with
serial_roofline_ratio = 4.9 — the one decode config far from its floor
(preset 2 sits at 1.10, the headline at ~1.25).  Shape deltas vs the
headline: ctx_dim = attn_dim = 2048 (2x), vocab 20096 (1.54x), motion
fusion (once per decode).  This probe times each island at the
preset-4 shape to find where the extra ~9 ms/step goes.

Protocol: serial-carry scans (N=300) + value-transfer sync, one probe
feedback consuming the full output (XLA DCEs unused matmul outputs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stvd.config import preset
from stvd.model import step as smod
from stvd.model.decoder import encode_context, init_params
from stvd.model.kernel import attention_core_pallas, make_logit_tail
from stvd.model.step import precompute

N = 300
B, k = 256, 5
R = B * k
bf = jnp.bfloat16


def timeit(f, *a, n=4):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / n / N * 1e3    # ms per scan step


def main():
    cfg = preset("4")
    mcfg = cfg.model
    d, dw, dc, a, v = (mcfg.dim, mcfg.dim_word, mcfg.ctx_dim,
                       mcfg.attn_dim, mcfg.n_words)
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), mcfg)
    cp = smod.cast_params(params, mcfg)

    # --- islands ---
    # 1. gates matmul: (R, dw+d+dc) @ (dw+d+dc, 4d) — dc=2048 here
    gx = jnp.asarray(rng.randn(R, dw + d + dc) * .3, bf)
    gw = jnp.asarray(rng.randn(dw + d + dc, 4 * d) * .02, bf)

    @jax.jit
    def run_gates(gx):
        def body(c, _):
            p = jnp.dot(c, gw, preferred_element_type=jnp.float32)
            return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
        c, _ = jax.lax.scan(body, gx, None, length=N)
        return c.sum()

    # 2. h projection: (R, d) @ (d, a+1) with a=2048
    hw = jnp.asarray(rng.randn(d, a + 1) * .02, bf)
    h0 = jnp.asarray(rng.randn(R, d) * .3, bf)

    @jax.jit
    def run_hproj(h0):
        def body(c, _):
            p = jnp.dot(c, hw, preferred_element_type=jnp.float32)
            return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
        c, _ = jax.lax.scan(body, h0, None, length=N)
        return c.sum()

    # 3. logit tail at vocab 20096
    w_log = jnp.asarray(rng.randn(dw, v) * .05, bf)
    b_log = jnp.zeros((v,), jnp.float32)
    tail = make_logit_tail(w_log, b_log, 5)
    x0 = jnp.asarray(rng.randn(R, dw) * .5, bf)

    @jax.jit
    def run_tail(x0):
        def body(c, _):
            vv, ii, ll = tail(c)
            return c * (1.0 + 1e-6 * (vv[:, :1] - ll[:, None])).astype(bf), ()
        c, _ = jax.lax.scan(body, x0, None, length=N)
        return c.sum()

    # 4. attention core (Pallas) at a=dc=2048, beam-broadcast
    frames = jnp.asarray(rng.randn(B, mcfg.n_frames, dc), jnp.float32)
    motion = jnp.asarray(rng.randn(B, mcfg.n_frames, mcfg.motion_dim),
                         jnp.float32)
    fmask = jnp.ones((B, mcfg.n_frames), jnp.float32)
    ctx = encode_context(cp, mcfg, frames, motion)
    sc = precompute(cp, mcfg, ctx, fmask)
    h_att0 = jnp.asarray(rng.randn(R, a) * .3, bf)
    beta0 = jnp.asarray(rng.randn(R) * .3, bf)   # 1-D: the core API

    @jax.jit
    def run_attn_pallas(h_att0, beta0):
        def body(c, _):
            h_att, beta = c
            ctx_t, alpha = attention_core_pallas(
                h_att, beta, sc.pctx, sc.ctx, sc.ctx_mask, cp["U_att"],
                cp["c_att"], cp["b_sel"], True)
            return (h_att * (1 + 1e-6 * ctx_t[:, :1]).astype(bf),
                    beta * (1 + 1e-6 * alpha[:, 0]).astype(bf)), ()
        c, _ = jax.lax.scan(body, (h_att0, beta0), None, length=N)
        return c[0].sum()

    @jax.jit
    def run_attn_jnp(h_att0, beta0):
        def body(c, _):
            h_att, beta = c
            ctx_t, alpha = smod._attention_core_jnp(
                h_att, beta, sc.pctx, sc.ctx, sc.ctx_mask,
                cp["U_att"], cp["c_att"], cp["b_sel"], True)
            return (h_att * (1 + 1e-6 * ctx_t[:, :1]).astype(bf),
                    beta * (1 + 1e-6 * alpha[:, 0]).astype(bf)), ()
        c, _ = jax.lax.scan(body, (h_att0, beta0), None, length=N)
        return c[0].sum()

    # 5. beam bookkeeping at vocab 20096: top-k merge + gathers
    logp0 = jnp.asarray(rng.randn(R, 64) * .1, jnp.float32)

    for name, f, args in [
        ("gates(dc2048)", run_gates, (gx,)),
        ("h_proj(a2048)", run_hproj, (h0,)),
        ("tail(v20096)", run_tail, (x0,)),
        ("attn_pallas", run_attn_pallas, (h_att0, beta0)),
        ("attn_jnp", run_attn_jnp, (h_att0, beta0)),
    ]:
        try:
            print(f"{name:14s}: {timeit(f, *args):6.3f} ms/step",
                  flush=True)
        except Exception as e:
            print(f"{name:14s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
