"""On-chip beam-step cost decomposition (the tool that found the 3D
top_k pitfall and the wgrad-accumulation ceiling in round 1).

Usage: python tools/measure_step_breakdown.py
Prints scan-amortized ms/step for: step-only, +logits, +softmax/topk,
+beam gathers — using value-transfer sync (the only reliable completion
sync through this machine's axon relay; see tools/tpu_probe.sh notes).
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from stvd.config import ModelConfig
from stvd.model import step as smod
from stvd.model.decoder import encode_context, init_params
from stvd.model.step import StepState, init_state, logits_from_states, precompute

def timeit(f, *a, n=4):
    float(f(*a)); t0 = time.perf_counter()
    for _ in range(n):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / n

mcfg = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                   n_frames=28, compute_dtype="bfloat16")
params = init_params(jax.random.PRNGKey(0), mcfg)
rng = np.random.RandomState(0)
B, k = 64, 5
Bs = B * k
batch = {"frames": jnp.asarray(rng.randn(B, 28, 1024), jnp.float32),
         "frame_mask": jnp.ones((B, 28), jnp.float32)}

def mk(kind):
    @jax.jit
    def run(params, batch):
        cp = smod.cast_params(params, mcfg)
        ctx = encode_context(cp, mcfg, batch["frames"])
        sc = precompute(cp, mcfg, ctx, batch["frame_mask"])
        st0 = init_state(cp, mcfg, sc)
        h0 = jnp.repeat(st0.h, k, axis=0)
        c0 = jnp.repeat(st0.c, k, axis=0)
        emb0 = jnp.zeros((Bs, mcfg.dim_word), cp["Wemb"].dtype)

        def body(carry, _):
            h, c, acc = carry
            out = smod.step(cp, mcfg, StepState(h, c), sc, emb0)
            if kind == "step":
                return (out.h, out.c, acc + out.ctx_t.sum()), ()
            logits = logits_from_states(cp, mcfg, out.h, out.ctx_t, emb0,
                                        train=False)
            if kind == "logits":
                return (out.h, out.c, acc + logits.sum()), ()
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            v, i = jax.lax.top_k(logp.reshape(Bs, -1), 5)  # 2D! (3D is 12x slower)
            if kind == "softtopk":
                return (out.h, out.c, acc + v.sum()), ()
            parent = (i[:, 0].reshape(B, k) % k).astype(jnp.int32)
            def gs(x):
                xk = x.reshape(B, k, -1)
                return jnp.take_along_axis(xk, parent[..., None], axis=1
                                           ).reshape(Bs, -1)
            return (gs(out.h), gs(out.c), acc + v.sum()), ()

        (h, c, acc), _ = jax.lax.scan(body, (h0, c0, 0.0), None, length=30)
        return acc
    return run

if __name__ == "__main__":
    for kind in ("step", "logits", "softtopk", "full"):
        dt = timeit(mk(kind), params, batch)
        print(f"{kind:9s}: {dt*1e3:7.1f} ms ({dt/30*1e3:5.2f} ms/step)",
              flush=True)
