"""Is b=1 int8 decode weight-RESIDENCY-bound rather than streaming-bound?

Battery 9 measured the b=1 beam-5 int8 decode at 3.41 ms — BELOW the
cost model's 3.63 ms HBM-streaming floor (ratio 0.94).  Hypothesis
(BASELINE.md "Serving latency"): the 73 MB int8 gates stack fits v5e's
128 MB VMEM and XLA keeps it loop-resident, so the per-step HBM read
the model charges never happens.  The bf16 stack is 147 MB (cannot
fit) and its ratio is a sane 1.39.

Four islands at bt = 1 video x 5 beams = 5 rows, serial-carry scan,
N=300 steps (per the BASELINE.md measurement-overhead calibration),
value-transfer sync:

  bf16_full   (5120, 14336) bf16 = 147 MB   — cannot fit: expect ~0.20 ms/step
                                              (147 MB / 735 GB/s streaming)
  bf16_half   (5120,  7168) bf16 =  73 MB   — fits: if residency, far below
                                              its 0.10 ms streaming floor
  int8_full   (5120, 14336) int8 =  73 MB   — fits: ditto
  int8_pingpong  2x int8_full alternating  = 147 MB total working set,
              IDENTICAL per-step op — if residency (not "int8 magic") is
              the mechanism, this reverts to ~0.20 ms/step streaming

Expected verdict pattern for the residency hypothesis:
  bf16_full slow, bf16_half fast, int8_full fast, int8_pingpong slow.
One JAX process only (machine rule).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

N = 300
BT = 5                       # 1 video x beam 5
DIN = 512 + 3584 + 1024      # [emb|h|ctx] concat, reference scale
DOUT = 4 * 3584
BW_GBs = 735.0               # measured read-only streaming (BASELINE.md)


def timeit(f, *a, n=4):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / n / N * 1e3


def main():
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    gx = jnp.asarray(rng.randn(BT, DIN) * .3, bf)

    w32 = rng.randn(DIN, DOUT).astype(np.float32) * .02
    w_bf = jnp.asarray(w32, bf)
    w_bf_half = jnp.asarray(w32[:, : DOUT // 2], bf)
    sc = np.maximum(np.abs(w32).max(0), 1e-8) / 127.0
    wq = jnp.asarray(np.clip(np.round(w32 / sc[None, :]), -127, 127),
                     jnp.int8)
    # second, distinct int8 matrix for the ping-pong control
    w32b = rng.randn(DIN, DOUT).astype(np.float32) * .02
    scb = np.maximum(np.abs(w32b).max(0), 1e-8) / 127.0
    wqb = jnp.asarray(np.clip(np.round(w32b / scb[None, :]), -127, 127),
                      jnp.int8)
    gsc = jnp.asarray(sc)
    gscb = jnp.asarray(scb)

    def bf16_body(w):
        def body(c, _):
            p = jnp.dot(c, w, preferred_element_type=jnp.float32)
            return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
        return body

    def int8_dot(c, w_q, w_sc):
        x32 = c.astype(jnp.float32)
        s_r = jnp.maximum(jnp.abs(x32).max(1, keepdims=True), 1e-8) / 127.
        xq = jnp.clip(jnp.round(x32 / s_r), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (s_r * w_sc[None, :])

    @jax.jit
    def run_bf16_full(gx):
        c, _ = jax.lax.scan(bf16_body(w_bf), gx, None, length=N)
        return c.sum()

    @jax.jit
    def run_bf16_half(gx):
        c, _ = jax.lax.scan(bf16_body(w_bf_half), gx, None, length=N)
        return c.sum()

    @jax.jit
    def run_int8_full(gx):
        def body(c, _):
            p = int8_dot(c, wq, gsc)
            return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
        c, _ = jax.lax.scan(body, gx, None, length=N)
        return c.sum()

    @jax.jit
    def run_int8_pingpong(gx):
        def body(carry, i):
            c = carry
            p = jax.lax.cond(i % 2 == 0,
                             lambda c: int8_dot(c, wq, gsc),
                             lambda c: int8_dot(c, wqb, gscb), c)
            return (c * (1 + 1e-6 * p.mean(1, keepdims=True))).astype(bf), ()
        c, _ = jax.lax.scan(body, gx, jnp.arange(N))
        return c.sum()

    floors = {
        "bf16_full": DIN * DOUT * 2 / BW_GBs / 1e6,
        "bf16_half": DIN * DOUT / BW_GBs / 1e6,
        "int8_full": DIN * DOUT / BW_GBs / 1e6,
        "int8_pingpong": DIN * DOUT * 2 / BW_GBs / 1e6,  # avg over steps:
        # each step streams ONE 73 MB matrix, but neither can stay
        # resident, so the streaming floor per step is one full matrix
    }
    floors["int8_pingpong"] = DIN * DOUT / BW_GBs / 1e6

    print(f"bt={BT} rows, ({DIN}, {DOUT}) gates stack, N={N}-step "
          f"serial-carry scans", flush=True)
    for name, f in [("bf16_full", run_bf16_full),
                    ("bf16_half", run_bf16_half),
                    ("int8_full", run_int8_full),
                    ("int8_pingpong", run_int8_pingpong)]:
        ms = timeit(f, gx)
        print(f"{name:14s}: {ms:6.3f} ms/step   "
              f"(streaming floor {floors[name]:5.3f} ms @ {BW_GBs:.0f} GB/s)",
              flush=True)
    print("B1_WEIGHTS_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
