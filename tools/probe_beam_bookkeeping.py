"""Beam bookkeeping island: can the parent-gather block beat XLA's
take_along_axis lowering?

BASELINE.md round-2 decode decomposition leaves one unattempted
quantified item: "beam bookkeeping (~0.17 ms over floor)" inside the
"attention core + beam gathers + misc" island.  The bookkeeping block
per step (decode/beam.py:body, after the logit tail) is:

  cand merge     top_k over (B, k*ki)=（384, 25)          — tiny
  word/parent    take_along_axis on (B, 25)               — tiny
  state reorder  2x take_along_axis (B, k, 3584) bf16     — 55 MB r+w
  buf reorder    take_along_axis (B, k, 30) i32 + update  — ~4 MB r+w
  flags          finished/lengths gathers + wheres        — tiny

HBM floor for the block ~0.08 ms; measured share ~0.2 ms.  Question:
is the slack in XLA's gather lowering (variants below attack that) or
irreducible small-op fusion overhead (then the island is at floor and
the BASELINE line gets a measured close-out)?

Variants, each a 300-step serial-carry scan at headline shape
(B=384, k=5, dim=3584, maxlen=30), value-transfer sync, carry consumes
the gathered state so nothing DCEs:

  v0_current   production block verbatim (2x take_along_axis 3-D)
  v1_flat      state rows gathered from the (B*k, dim) 2-D view with
               flat indices b*k+parent (row gather, no batch dims)
  v2_onehot    new_state = einsum('bij,bjd->bid', onehot(parent), x)
               (MXU permutation matmul instead of a gather)
  v3_nobuf     v0 minus the token-buffer gather+update (decomposes the
               buf share; production cannot drop it, this is a bound)
  v4_joint     h and c stacked on a NEW leading axis (2, B, k, dim) and
               gathered by one take_along_axis (no concat copy; tests
               whether one 4-D gather beats two 3-D gathers)

After v1_flat won the state-reorder A/B (battery r4g, default flipped
to 'flat'), the residual question is the token-buffer reorder (still a
3-D take_along_axis in the flat context):

  v5_flat_fb   v1_flat state + buf ALSO row-gathered from the
               (B*k, maxlen) 2-D view with the same flat rows
  v6_flat_nobuf v1_flat state, buf untouched (bound: what dropping the
               buf reorder entirely would buy — backpointer
               reconstruction territory)

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
B = 384
K = 5
KI = 5
DIM = 3584
MAXLEN = 30
BW_GBs = 735.0
EOS_ID = 0
_NEG = -1.0e30


def timeit(f, *a, n=4):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(*a)
    float(s)
    return (time.perf_counter() - t0) / n / N * 1e3


def _fake_scores(h):
    # (B, k, ki) pseudo per-beam top-k values/indices derived from the
    # carried state: keeps the serial dependency real without paying the
    # gates/attention/tail cost this probe is not measuring.
    m = h.reshape(B, K, DIM)[:, :, :KI].astype(jnp.float32)
    vals = jax.nn.log_softmax(m, axis=-1)
    idx = jnp.argsort(m, axis=-1).astype(jnp.int32) + 1
    return vals, idx


def _bookkeeping(h, c, scores, finished, lengths, buf, t, variant):
    pb_vals, pb_idx = _fake_scores(h)
    eos_vals = jnp.full((KI,), _NEG).at[0].set(0.0)
    eos_idx = jnp.where(jnp.arange(KI, dtype=jnp.int32) == 0, EOS_ID,
                        jnp.arange(KI, dtype=jnp.int32))
    pb_vals = jnp.where(finished[..., None], eos_vals, pb_vals)
    pb_idx = jnp.where(finished[..., None], eos_idx, pb_idx)
    cand = (scores[..., None] + pb_vals).reshape(B, K * KI)
    new_scores, merge_idx = jax.lax.top_k(cand, K)
    parent = (merge_idx // KI).astype(jnp.int32)
    word = jnp.take_along_axis(
        pb_idx.reshape(B, K * KI), merge_idx, axis=1).astype(jnp.int32)

    def g(x):
        return jnp.take_along_axis(x, parent, axis=1)

    par_finished = g(finished)
    new_finished = jnp.logical_or(par_finished, word == EOS_ID)
    new_lengths = g(lengths) + jnp.logical_not(par_finished)

    if variant in ("v0_current", "v3_nobuf"):
        def gs(x):
            xk = x.reshape(B, K, -1)
            return jnp.take_along_axis(
                xk, parent[..., None], axis=1).reshape(B * K, -1)
        new_h, new_c = gs(h), gs(c)
    elif variant in ("v1_flat", "v5_flat_fb", "v6_flat_nobuf"):
        rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
                + parent).reshape(B * K)
        new_h, new_c = h[rows], c[rows]
    elif variant == "v2_onehot":
        oh = jax.nn.one_hot(parent, K, dtype=h.dtype)        # (B, k, k)
        def gs(x):
            xk = x.reshape(B, K, DIM)
            return jnp.einsum("bij,bjd->bid", oh, xk,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype).reshape(B * K, DIM)
        new_h, new_c = gs(h), gs(c)
    elif variant == "v4_joint":
        hc = jnp.stack([h.reshape(B, K, DIM), c.reshape(B, K, DIM)])
        new_hc = jnp.take_along_axis(
            hc, parent[None, :, :, None], axis=2)
        new_h = new_hc[0].reshape(B * K, DIM)
        new_c = new_hc[1].reshape(B * K, DIM)
    else:
        raise ValueError(variant)

    emit = jnp.where(par_finished, EOS_ID, word)
    if variant in ("v3_nobuf", "v6_flat_nobuf"):
        new_buf = buf
    elif variant == "v5_flat_fb":
        new_buf = buf.reshape(B * K, MAXLEN)[rows].reshape(B, K, MAXLEN)
        new_buf = jax.lax.dynamic_update_index_in_dim(
            new_buf, emit, t % MAXLEN, axis=2)
    else:
        new_buf = jnp.take_along_axis(buf, parent[..., None], axis=1)
        new_buf = jax.lax.dynamic_update_index_in_dim(
            new_buf, emit, t % MAXLEN, axis=2)
    return new_h, new_c, new_scores, new_finished, new_lengths, new_buf


def make_run(variant):
    @jax.jit
    def run(h0, c0):
        scores0 = jnp.tile(jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((K - 1,), _NEG)]), (B, 1))
        init = (h0, c0, scores0, jnp.zeros((B, K), bool),
                jnp.zeros((B, K), jnp.int32),
                jnp.zeros((B, K, MAXLEN), jnp.int32))

        def body(carry, t):
            h, c, scores, fin, lens, buf = carry
            h2, c2, s2, f2, l2, b2 = _bookkeeping(
                h, c, scores, fin, lens, buf, t, variant)
            # never let everything retire (finished beams would make the
            # gathers degenerate): reset the flags, keep the data dep
            f2 = jnp.logical_and(f2, t < 0)
            # fold gathered state back into the carry (full consumption)
            h2 = h2 + 1e-6 * c2.astype(h2.dtype)
            return (h2, c2, s2 - s2.mean(), f2, l2 % 1000, b2), ()

        (h, c, s, f, l, buf), _ = jax.lax.scan(
            body, init, jnp.arange(N, dtype=jnp.int32))
        return (h.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()
                + s.sum() + l.sum() + buf.sum())
    return run


def main():
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(B * K, DIM) * 0.1, jnp.bfloat16)
    c0 = jnp.asarray(rng.randn(B * K, DIM) * 0.1, jnp.bfloat16)
    state_mb = 2 * 2 * B * K * DIM * 2 / 1e6
    buf_mb = 2 * B * K * MAXLEN * 4 / 1e6
    floor_ms = (state_mb + buf_mb) / 1e3 / BW_GBs * 1e3
    print(f"B={B} k={K} dim={DIM}: state gather r+w {state_mb:.1f} MB, "
          f"buf r+w {buf_mb:.1f} MB, HBM floor {floor_ms:.3f} ms/step",
          flush=True)
    for variant in ("v0_current", "v1_flat", "v2_onehot", "v3_nobuf",
                    "v4_joint", "v5_flat_fb", "v6_flat_nobuf"):
        ms = timeit(make_run(variant), h0, c0)
        print(f"{variant:11s}: {ms:6.3f} ms/step", flush=True)
    print("BEAM_BOOKKEEPING_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
