"""Isolate per-step costs of the kernel decode path at headline shape.

b=384 videos x beam 5 = 1920 rows, dim 3584, ctx 1024, vocab 13056.
Times each fusion island in a scan with a serial carry (so XLA can't
hoist), value-transfer sync. One JAX process only.

N=300 steps per invocation: this machine's relay costs ~6.5 ms per
timed invocation (per-sync RTT + ~0.5 ms dispatch), so 30-step loops
over-report by ~0.22 ms/step (calibrated with a trivial body:
0.229 -> 0.022 -> 0.003 ms/step at N=30/300/3000). See BASELINE.md
"Decode roofline, corrected".
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from stvd.config import ModelConfig
from stvd.model import step as smod
from stvd.model.decoder import encode_context, init_params
from stvd.model.kernel import make_logit_tail, attention_core_pallas
from stvd.model.step import StepState, init_state, precompute

N = 300


def timeit(f, *a, n=4):
    float(f(*a)); t0 = time.perf_counter()
    for _ in range(n):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / n / N * 1e3   # ms per scan step


mcfg = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                   n_frames=28, compute_dtype="bfloat16")
params = init_params(jax.random.PRNGKey(0), mcfg)
rng = np.random.RandomState(0)
B, k = 384, 5
R = B * k
bf = jnp.bfloat16

cp = smod.cast_params(params, mcfg)
w_log = jnp.asarray(rng.randn(512, 13056) * .05, bf)
b_log = jnp.zeros((13056,), jnp.float32)
tail = make_logit_tail(w_log, b_log, 5)

x0 = jnp.asarray(rng.randn(R, 512) * .5, bf)


@jax.jit
def run_tail(x0):
    def body(c, _):
        v, i, l = tail(c)
        # feed a value-dependent bf16 back in to keep serial dependency
        return c * (1.0 + 1e-6 * (v[:, :1] - l[:, None])).astype(bf), ()
    c, _ = jax.lax.scan(body, x0, None, length=N)
    return c.sum()


gx = jnp.asarray(rng.randn(R, 512 + 3584 + 1024) * .3, bf)
gw = jnp.asarray(rng.randn(512 + 3584 + 1024, 4 * 3584) * .02, bf)
gw32 = np.asarray(gw, np.float32)
gsc = jnp.asarray(np.maximum(np.abs(gw32).max(0), 1e-8) / 127.0)
gq = jnp.asarray(np.clip(np.round(gw32 / np.asarray(gsc)[None, :]),
                         -127, 127), jnp.int8)


@jax.jit
def run_gates_bf16(gx):
    def body(c, _):
        p = jnp.dot(c, gw, preferred_element_type=jnp.float32)
        return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
    c, _ = jax.lax.scan(body, gx, None, length=N)
    return c.sum()


@jax.jit
def run_gates_int8(gx):
    def body(c, _):
        x32 = c.astype(jnp.float32)
        s_r = jnp.maximum(jnp.abs(x32).max(1, keepdims=True), 1e-8) / 127.
        xq = jnp.clip(jnp.round(x32 / s_r), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, gq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        p = acc.astype(jnp.float32) * (s_r * gsc[None, :])
        return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
    c, _ = jax.lax.scan(body, gx, None, length=N)
    return c.sum()


# attention core at full shape
batch = {"frames": jnp.asarray(rng.randn(B, 28, 1024), jnp.float32),
         "frame_mask": jnp.ones((B, 28), jnp.float32)}
ctx = encode_context(cp, mcfg, batch["frames"])
sc = precompute(cp, mcfg, ctx, batch["frame_mask"])
h_att0 = jnp.asarray(rng.randn(R, mcfg.attn_dim) * .3, bf)
beta0 = jnp.asarray(rng.randn(R, 1) * .3, bf)
pctx_r = jnp.repeat(sc.pctx, k, axis=0)
ctx_r = jnp.repeat(sc.ctx, k, axis=0)
mask_r = jnp.repeat(sc.ctx_mask, k, axis=0)


@jax.jit
def run_attn(h_att0, beta0):
    def body(c, _):
        h_att, beta = c
        ctx_t, alpha = attention_core_pallas(
            h_att, beta, pctx_r, ctx_r, mask_r, cp["U_att"], cp["c_att"],
            cp["b_sel"], jnp.bfloat16)
        return (h_att * (1 + 1e-6 * ctx_t[:, :1]).astype(bf),
                beta * (1 + 1e-6 * alpha[:, :1]).astype(bf)), ()
    c, _ = jax.lax.scan(body, (h_att0, beta0), None, length=N)
    return c[0].sum()


# h projection (dim -> attn+1 fused weights)
hw = jnp.asarray(rng.randn(3584, mcfg.attn_dim + 1) * .02, bf)
h0 = jnp.asarray(rng.randn(R, 3584) * .3, bf)


@jax.jit
def run_hproj(h0):
    def body(c, _):
        p = jnp.dot(c, hw, preferred_element_type=jnp.float32)
        return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
    c, _ = jax.lax.scan(body, h0, None, length=N)
    return c.sum()


if __name__ == "__main__" and not os.environ.get("SKIP_BASE"):
    for name, f, a in [("tail", run_tail, (x0,)),
                       ("gates_bf16", run_gates_bf16, (gx,)),
                       ("gates_int8", run_gates_int8, (gx,)),
                       ("h_proj", run_hproj, (h0,))]:
        print(f"{name:11s}: {timeit(f, *a):6.3f} ms/step", flush=True)


# --- variants ---
hw_a = jnp.asarray(np.asarray(hw)[:, :1024])
hw_s = jnp.asarray(np.asarray(hw)[:, 1024:])


@jax.jit
def run_hproj_split(h0):
    def body(c, _):
        p = jnp.dot(c, hw_a, preferred_element_type=jnp.float32)
        s = jnp.dot(c, hw_s, preferred_element_type=jnp.float32)
        return (c * (1 + 1e-6 * (p.mean(1, keepdims=True) + s))).astype(bf), ()
    c, _ = jax.lax.scan(body, h0, None, length=N)
    return c.sum()


@jax.jit
def run_gates_int8_bf16q(gx):
    def body(c, _):
        # quantize straight from bf16 (half the VPU bytes of the f32 path)
        s_r = (jnp.maximum(jnp.abs(c).max(1, keepdims=True).astype(jnp.float32),
                           1e-8) / 127.)
        xq = jnp.clip(jnp.round(c.astype(jnp.float32) / s_r), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, gq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        p = acc.astype(jnp.float32) * (s_r * gsc[None, :])
        return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
    c, _ = jax.lax.scan(body, gx, None, length=N)
    return c.sum()


@jax.jit
def run_gates_int8_pure(gx8):
    # floor: int8 matmul alone (pre-quantized input, no per-step quant)
    def body(c, _):
        acc = jax.lax.dot_general(c, gq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        p = acc.astype(jnp.float32) * gsc[None, :]
        m = (p.mean(1, keepdims=True) * 0).astype(jnp.int8)
        return c + m, ()
    c, _ = jax.lax.scan(body, gx8, None, length=N)
    return c.sum()


gx8 = jnp.clip(jnp.round(gx.astype(jnp.float32) * 2), -127, 127).astype(jnp.int8)
for name, f, a in [("hproj_split", run_hproj_split, (h0,)),
                   ("int8_bf16q", run_gates_int8_bf16q, (gx,)),
                   ("int8_pure", run_gates_int8_pure, (gx8,))]:
    print(f"{name:11s}: {timeit(f, *a):6.3f} ms/step", flush=True)
