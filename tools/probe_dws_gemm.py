"""Layout probe for the post-scan dWs_att GEMM (config-2 training).

The spatial VJP returns d[pregion] (B,K,R,s); the outer autodiff of
``pregion = regions @ Ws_att + bs_att`` then forms

    dWs_att = regions.reshape(-1, Dr)^T @ dpregion.reshape(-1, s)

— an (Dr=1024) x (B*K*R=87808) x (s=1024) GEMM measured at 4.4 ms
standalone (42 TF/s realized, round 3 island table), ~3 ms over its
~1.4 ms resource floor (compute 0.93 ms, HBM 0.44 ms).  This probe
times lowering variants of the same contraction to see whether the
slack is layout (transpose-copy of the 180 MB operand) or inherent to
the tall-skinny shape.  Variants:

  a. transpose+dot     jnp.dot(A.T, B)         (what autodiff emits)
  b. dot_general       contract dim 0 x dim 0  (no explicit transpose)
  c. einsum kd,ks->ds
  d. batched einsum    (BK, R, Dr) x (BK, R, s) -> sum over batch
  e. f32 copies of a.  (is bf16 input the penalty?)

Timing: 8 pipelined invocations per sync, 3 rounds, value-transfer
sync (CLAUDE.md measurement rules)."""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, R, Dr, S = 64, 28, 49, 1024, 1024
N = B * K * R


def timeit(name, fn, *args, iters=8, rounds=3):
    try:
        out = fn(*args)
    except Exception as e:  # e.g. scoped-VMEM OOM at kt=896
        print(f"{name:28s}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:80]})", flush=True)
        return
    float(out.reshape(-1)[0])                      # compile + warm
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    gf = 2 * Dr * N * S / 1e9
    print(f"{name:28s}: {best*1e3:7.3f} ms  ({gf/best/1e3:.1f} TF/s)",
          flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a16 = (0.1 * jax.random.normal(k1, (N, Dr))).astype(jnp.bfloat16)
    b16 = (0.1 * jax.random.normal(k2, (N, S))).astype(jnp.bfloat16)

    @jax.jit
    def v_a(a, b):
        return jnp.dot(a.T, b, preferred_element_type=jnp.float32)

    @jax.jit
    def v_b(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def v_c(a, b):
        return jnp.einsum("kd,ks->ds", a, b,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def v_d(a, b):
        ab = a.reshape(B * K, R, Dr)
        bb = b.reshape(B * K, R, S)
        return jnp.einsum("nrd,nrs->ds", ab, bb,
                          preferred_element_type=jnp.float32)

    # f. hand-written Pallas K-streaming GEMM: grid over K chunks, the
    # (Dr, S) f32 accumulator lives in VMEM scratch for the whole
    # sweep; each program contracts one (kt, Dr) x (kt, S) chunk pair.
    def dws_kernel(a_ref, b_ref, o_ref, acc):
        kk = pl.program_id(0)

        @pl.when(kk == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] = acc[:] + jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(kk == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    @functools.partial(jax.jit, static_argnames=("kt",))
    def v_f(a, b, kt=448):
        return pl.pallas_call(
            dws_kernel,
            grid=(N // kt,),
            in_specs=[
                pl.BlockSpec((kt, Dr), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kt, S), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Dr, S), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Dr, S), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Dr, S), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(a, b)

    timeit("a transpose+dot bf16", v_a, a16, b16)
    timeit("b dot_general dim0 bf16", v_b, a16, b16)
    timeit("c einsum bf16", v_c, a16, b16)
    timeit("d batched einsum bf16", v_d, a16, b16)
    a32, b32 = a16.astype(jnp.float32), b16.astype(jnp.float32)
    timeit("e transpose+dot f32", v_a, a32, b32)
    for kt in (448, 896, 1792):
        timeit(f"f pallas k-stream kt={kt}",
               lambda a, b, kt=kt: v_f(a, b, kt), a16, b16)
    err = jnp.abs(v_f(a16, b16) - v_a(a16, b16)).max()
    print(f"f parity max|diff|: {float(err):.3e}", flush=True)
    print("DONE_DWS", flush=True)


if __name__ == "__main__":
    main()
