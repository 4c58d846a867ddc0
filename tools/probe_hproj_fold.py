"""Probe: fold the next step's h-projection into the decode epilogue?

Round-2 BASELINE.md names the h-projection's small-N inefficiency
(0.23 ms at (1920, 3584, 1025)) as residual decode headroom and
suggests folding it into the previous step's epilogue.  The concrete
candidate measured here: the logit-activation matmul h_t @ ff_logit_lstm_W
(N=512) and the NEXT step's h-projection h_t @ [Wd_att|W_sel] (N=1025)
share the same LHS — fusing them into one (dim, 1537) matmul halves the
small-N dispatch count, at the cost of carrying hp through the loop
(and, in real beam decode, one extra (B*k, A+1) parent-gather).

Variant A = production ordering (h-projection at the top of each step).
Variant B = fused epilogue, hp carried.

Both run the full serial decode chain (attention -> gates -> epilogue
-> vocab tail -> argmax feedback) in a lax.scan over T=30 steps so
nothing is DCE'd or hoisted; timing via value-transfer sync with >=8
pipelined invocations per sync (this machine's relay protocol —
BASELINE.md 'measurement-overhead calibration').

Result goes to BASELINE.md either way (negative results are recorded,
not deleted).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main(bt=1920, d=3584, dw=512, dc=1024, a=1024, v=13056, k_f=28,
         t_steps=30, iters=16):
    on_tpu = jax.default_backend() == "tpu"
    cd = jnp.bfloat16 if on_tpu else jnp.float32
    rng = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(rng, 24))
    n = lambda *s: (0.01 * jax.random.normal(next(ks), s)).astype(cd)

    wemb = n(v, dw)
    h_att_w = n(d, a + 1)
    gates_w = n(dw + d + dc, 4 * d)
    b_g = jnp.zeros((4 * d,), jnp.float32)
    w_ll = n(d, dw)            # ff_logit_lstm_W
    w_lc = n(dc, dw)           # ff_logit_ctx_W
    w_v = n(dw, v)             # ff_logit_W
    b_v = jnp.zeros((v,), jnp.float32).at[0].set(-1e9)
    # fused epilogue weights for variant B: [h_att_w | ff_logit_lstm_W]
    w_epi = jnp.concatenate([h_att_w, w_ll], axis=1)   # (d, a+1+dw)
    pctx = (0.01 * jax.random.normal(next(ks), (bt, k_f, a))).astype(
        jnp.float32)
    ctx = n(bt, k_f, dc)
    u_att = n(a).astype(jnp.float32)

    if on_tpu:
        from stvd.model.kernel import make_logit_tail
        tail = make_logit_tail(w_v, b_v, 5)
    else:
        def tail(act):
            logits = jnp.dot(act.astype(cd), w_v,
                             preferred_element_type=jnp.float32) + b_v
            lse = jax.nn.logsumexp(logits, axis=-1)
            vals, idx = jax.lax.top_k(logits, 5)
            return vals, idx, lse

    def attention(hp, h):
        h_at = hp[:, :a]
        beta_l = hp[:, a]
        e = jnp.tanh(env['pctx'] + h_at[:, None, :])
        s = jnp.einsum("bkd,d->bk", e, u_att.astype(e.dtype))
        al = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        ctx_t = jnp.einsum("bk,bkd->bd", al.astype(cd), env['ctx']).astype(
            jnp.float32)
        return ctx_t * jax.nn.sigmoid(beta_l)[:, None]

    def lstm(emb, h, c, ctx_t):
        x_cat = jnp.concatenate([emb.astype(cd), h.astype(cd),
                                 ctx_t.astype(cd)], axis=1)
        pre = jnp.dot(x_cat, env['gates_w'],
                      preferred_element_type=jnp.float32) + b_g
        i = jax.nn.sigmoid(pre[:, :d])
        f = jax.nn.sigmoid(pre[:, d:2 * d])
        o = jax.nn.sigmoid(pre[:, 2 * d:3 * d])
        g = jnp.tanh(pre[:, 3 * d:])
        c_t = f * c + i * g
        return o * jnp.tanh(c_t), c_t

    def finish(act_pre, ctx_t, emb):
        act = jnp.tanh(act_pre
                       + jnp.dot(ctx_t.astype(cd), env['w_lc'],
                                 preferred_element_type=jnp.float32)
                       + emb.astype(jnp.float32))
        vals, idx, lse = tail(act)
        # argmax feedback: the serial dependency real decode has
        return env['wemb'][idx[:, 0]], vals[:, 0] - lse

    def step_a(carry, _):
        h, c, emb, acc = carry
        hp = jnp.dot(h.astype(cd), env['h_att_w'],
                     preferred_element_type=jnp.float32)
        ctx_t = attention(hp, h)
        h_t, c_t = lstm(emb, h, c, ctx_t)
        act_pre = jnp.dot(h_t.astype(cd), env['w_ll'],
                          preferred_element_type=jnp.float32)
        emb2, s = finish(act_pre, ctx_t, emb)
        return (h_t, c_t, emb2, acc + s.sum()), None

    def step_b(carry, _):
        h, c, hp, emb, acc = carry
        ctx_t = attention(hp, h)
        h_t, c_t = lstm(emb, h, c, ctx_t)
        epi = jnp.dot(h_t.astype(cd), env['w_epi'],
                      preferred_element_type=jnp.float32)
        hp_next = epi[:, : a + 1]
        act_pre = epi[:, a + 1:]
        emb2, s = finish(act_pre, ctx_t, emb)
        return (h_t, c_t, hp_next, emb2, acc + s.sum()), None

    h0 = jnp.zeros((bt, d), jnp.float32)
    c0 = jnp.zeros((bt, d), jnp.float32)
    emb0 = jnp.zeros((bt, dw), cd)
    hp0 = jnp.dot(h0.astype(cd), h_att_w,
                  preferred_element_type=jnp.float32)

    # big tensors ride as jit ARGS, not closure constants: baked-in
    # constants blow the axon relay's compile-payload limit (HTTP 413)
    consts = dict(wemb=wemb, h_att_w=h_att_w, gates_w=gates_w, w_ll=w_ll,
                  w_lc=w_lc, w_epi=w_epi, pctx=pctx, ctx=ctx)
    env = {}

    @jax.jit
    def run_a(h, c, consts):
        env.update(consts)
        (h, c, _, acc), _ = jax.lax.scan(
            step_a, (h, c, emb0, jnp.zeros(())), None, length=t_steps)
        return acc

    @jax.jit
    def run_b(h, c, consts):
        env.update(consts)
        (h, c, _, _, acc), _ = jax.lax.scan(
            step_b, (h, c, hp0, emb0, jnp.zeros(())), None, length=t_steps)
        return acc

    for name, fn in (("A_production", run_a), ("B_fused_epilogue", run_b)):
        float(fn(h0, c0, consts))              # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(h0, c0, consts)
        float(s)                               # one value-transfer sync
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3 / t_steps:.4f} ms/step "
              f"({dt * 1e3:.2f} ms / {t_steps} steps)", flush=True)


if __name__ == "__main__":
    small = "--small" in sys.argv
    if small:
        main(bt=64, d=256, dw=128, dc=128, a=128, v=1024, k_f=8, iters=4)
    else:
        main()
