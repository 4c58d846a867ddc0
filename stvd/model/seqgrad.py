"""Hand-derived sequence VJP for the teacher-forced train scan.

WHY THIS EXISTS (measured on v5e-1 at reference scale, batch 64):
JAX's automatic transpose of ``lax.scan`` accumulates the cotangent of
every loop-invariant weight in a full-precision carry that is read and
written EVERY backward step.  For the concatenated h-projection weights
(dim, 4*dim+attn+1) that carry is an f32[3584, 15361] = 220 MB tensor;
its accumulation fusion alone profiled at 7.5 ms of the 40 ms train
step, and raising ``scan_unroll`` to 30 only recovered ~1 step/s.

This module replaces autodiff for the whole sequence with the classic
RNN-training identity (the same restructuring cuDNN uses): the backward
scan computes ONLY the per-step preactivation cotangents ``dhp_t`` and
stacks them; the weight gradients then fall out as two post-scan GEMMs

    d[U|Wd_att|W_sel] = h_prev_stack^T @ dhp_stack        (one MXU pass)
    dWc               = ctx_t_stack^T  @ dpre_stack       (one MXU pass)

so the 220 MB accumulator never exists — the stacked (T*B, 15361)
cotangent is written once and read once.

Semantics are identical to ``step.step_with_core`` with ``x_pre`` given
(the teacher-forced fast path of ``decoder.forward_train``): fused
h-projection, temporal masked-softmax attention over the precomputed
``pctx``, selector gate, LSTM gates.  Parity with autodiff is pinned by
tests at compute_dtype=float32 (exact math, 1e-5) and bfloat16 (loose).

Scope: teacher forcing (ss_prob=0), no spatial attention (config 2 uses
autodiff + remat), any selector/encoder/motion setting (those live
outside the scan).  Reference: the theano ``lstm_cond_layer`` scan this
replaces (``model_attention.py:§build_model`` — SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .step import _dot, masked_softmax

Static = Tuple[int, int, bool, int, str]   # (dim, attn, selector, unroll, cd)


def _gates(preact, dim):
    i = jax.nn.sigmoid(preact[:, 0 * dim: 1 * dim])
    f = jax.nn.sigmoid(preact[:, 1 * dim: 2 * dim])
    o = jax.nn.sigmoid(preact[:, 2 * dim: 3 * dim])
    g = jnp.tanh(preact[:, 3 * dim: 4 * dim])
    return i, f, o, g


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_sequence(static: Static, hw, wc, u_att, c_att, b_sel, ctx, pctx,
                   ctx_mask, h0, c0, x_pre_all):
    """Run the teacher-forced decoder scan; returns (hs, ctxs, alphas)
    time-major (T, B, ...).  All array args are explicit so the custom
    VJP emits a cotangent for each (the outer autodiff then splits
    d[hw] into dU/dWd_att/dW_sel through the concat, routes d[pctx] to
    Wc_att/b_att, d[x_pre_all] to W/b/Wemb, etc.)."""
    out, _ = _fwd(static, hw, wc, u_att, c_att, b_sel, ctx, pctx, ctx_mask,
                  h0, c0, x_pre_all)
    return out


def _fwd(static, hw, wc, u_att, c_att, b_sel, ctx, pctx, ctx_mask, h0, c0,
         x_pre_all):
    dim, attn, selector, unroll, cd = static
    cdtype = jnp.dtype(cd)
    u32 = u_att.astype(pctx.dtype)

    def body(carry, x_pre_t):
        h, c = carry
        hp = _dot(h, hw, cdtype)                     # (B, 4d+attn+1)
        h_gates = hp[:, : 4 * dim]
        h_att = hp[:, 4 * dim: 4 * dim + attn]
        blogit = hp[:, 4 * dim + attn]
        e = jnp.tanh(pctx + h_att[:, None, :])       # (B, K, A) fp32
        scores = jnp.einsum("bkd,d->bk", e, u32) + c_att
        alpha = masked_softmax(scores.astype(jnp.float32), ctx_mask,
                               axis=-1)
        ctx_t = jnp.einsum("bk,bkd->bd", alpha.astype(ctx.dtype),
                           ctx).astype(jnp.float32)
        if selector:
            beta = jax.nn.sigmoid(blogit.astype(jnp.float32) + b_sel)
            ctx_t = ctx_t * beta[:, None]
        preact = x_pre_t + h_gates + _dot(ctx_t, wc, cdtype)
        i, f, o, g = _gates(preact, dim)
        c_t = f * c + i * g
        h_t = o * jnp.tanh(c_t)
        return ((h_t, c_t),
                (h_t, c_t, ctx_t, alpha, preact, h_att, blogit))

    (_, _), ys = jax.lax.scan(body, (h0, c0), x_pre_all, unroll=unroll)
    hs, cs, ctxs, alphas, preacts, h_atts, blogits = ys
    res = (hw, wc, u_att, c_att, b_sel, ctx, pctx, ctx_mask, h0, c0,
           hs, cs, ctxs, alphas, preacts, h_atts, blogits)
    return (hs, ctxs, alphas), res


def _bwd(static, res, g):
    dim, attn, selector, unroll, cd = static
    cdtype = jnp.dtype(cd)
    (hw, wc, u_att, c_att, b_sel, ctx, pctx, ctx_mask, h0, c0,
     hs, cs, ctxs, alphas, preacts, h_atts, blogits) = res
    dhs, dctxs, dalphas = g
    T, B = hs.shape[0], hs.shape[1]
    K = ctx.shape[1]

    # step t's body read h_{t-1}, c_{t-1}: shift the saved stacks
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    wc_t = wc.T
    hw_t = hw.T
    u32 = u_att.astype(pctx.dtype)
    mask_f = (ctx_mask > 0).astype(jnp.float32)

    def body(carry, xs):
        dh, dc, du_att, dc_att, db_sel, dpctx, dctx = carry
        (hp_t, cp_t, c_t, ctx_t, alpha, preact, h_att, blogit,
         dh_out, dctx_out, dalpha_out) = xs

        # ---- LSTM cell backward ----
        dh_tot = dh + dh_out
        i, f, o, gg = _gates(preact, dim)
        tc = jnp.tanh(c_t)
        dct = dc + dh_tot * o * (1.0 - tc * tc)
        do = dh_tot * tc
        dpre = jnp.concatenate(
            [dct * gg * i * (1.0 - i),            # di through sigmoid
             dct * cp_t * f * (1.0 - f),          # df
             do * o * (1.0 - o),                  # do
             dct * i * (1.0 - gg * gg)], axis=1)  # dg through tanh
        dc_prev = dct * f

        # ---- context / selector backward ----
        dctx_t = dctx_out + jnp.dot(dpre.astype(cdtype), wc_t,
                                    preferred_element_type=jnp.float32)
        ctxw = jnp.einsum("bk,bkd->bd", alpha.astype(ctx.dtype),
                          ctx).astype(jnp.float32)
        if selector:
            beta = jax.nn.sigmoid(blogit.astype(jnp.float32) + b_sel)
            dbeta = jnp.sum(dctx_t * ctxw, axis=1)
            dctxw = dctx_t * beta[:, None]
            dblogit = dbeta * beta * (1.0 - beta)
            db_sel = db_sel + jnp.sum(dblogit)
        else:
            dctxw = dctx_t
            dblogit = jnp.zeros((B,), jnp.float32)

        # ---- attention backward (masked softmax over K frames) ----
        dalpha = (jnp.einsum("bd,bkd->bk", dctxw.astype(ctx.dtype),
                             ctx).astype(jnp.float32) + dalpha_out)
        dctx = dctx + (alpha.astype(ctx.dtype)[:, :, None]
                       * dctxw.astype(ctx.dtype)[:, None, :])
        ds = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=1,
                                       keepdims=True))
        ds = ds * mask_f                      # masked lanes carry no grad
        dc_att = dc_att + jnp.sum(ds)
        e = jnp.tanh(pctx + h_att[:, None, :])   # recompute (B, K, A)
        du_att = du_att + jnp.einsum("bk,bka->a", ds,
                                     e.astype(jnp.float32))
        dpe = (ds[:, :, None] * u32).astype(e.dtype) * (1.0 - e * e)
        dpctx = dpctx + dpe
        dh_att = jnp.sum(dpe, axis=1)            # (B, A)

        # ---- h-projection backward: emit dhp, carry dh_{t-1} ----
        dhp = jnp.concatenate(
            [dpre, dh_att.astype(jnp.float32), dblogit[:, None]], axis=1)
        dh_prev = jnp.dot(dhp.astype(cdtype), hw_t,
                          preferred_element_type=jnp.float32)
        return ((dh_prev, dc_prev, du_att, dc_att, db_sel, dpctx, dctx),
                dhp)

    carry0 = (jnp.zeros_like(h0), jnp.zeros_like(c0),
              jnp.zeros((attn,), jnp.float32), jnp.zeros((), jnp.float32),
              jnp.zeros((), jnp.float32), jnp.zeros_like(pctx),
              jnp.zeros(ctx.shape, jnp.float32))
    xs = (h_prev, c_prev, cs, ctxs, alphas, preacts, h_atts, blogits,
          dhs, dctxs, dalphas)
    (dh0, dc0, du_att, dc_att, db_sel, dpctx, dctx), dhp_stack = \
        jax.lax.scan(body, carry0, xs, reverse=True, unroll=unroll)

    # ---- weight gradients as single GEMMs over all T*B rows ----
    P = dhp_stack.shape[-1]
    dhp_flat = dhp_stack.reshape(T * B, P)
    dhw = jnp.dot(h_prev.reshape(T * B, -1).astype(cdtype).T,
                  dhp_flat.astype(cdtype),
                  preferred_element_type=jnp.float32).astype(hw.dtype)
    dpre_flat = dhp_flat[:, : 4 * dim]
    dwc = jnp.dot(ctxs.reshape(T * B, -1).astype(cdtype).T,
                  dpre_flat.astype(cdtype),
                  preferred_element_type=jnp.float32).astype(wc.dtype)
    dx_pre = dhp_stack[:, :, : 4 * dim]

    return (dhw, dwc, du_att.astype(u_att.dtype),
            dc_att.astype(jnp.result_type(c_att)),
            db_sel.astype(jnp.result_type(b_sel)),
            dctx.astype(ctx.dtype), dpctx.astype(pctx.dtype),
            jnp.zeros_like(ctx_mask), dh0, dc0, dx_pre)


fused_sequence.defvjp(_fwd, _bwd)


def run(params, cfg, sc, state0, x_pre_all_tm):
    """Adapter: call fused_sequence from decoder.forward_train's fast
    path.  ``x_pre_all_tm`` is time-major (T, B, 4*dim)."""
    from .step import _h_projection_weights
    hw = sc.h_proj_w if sc.h_proj_w is not None \
        else _h_projection_weights(params, cfg)
    static = (cfg.dim, cfg.attn_dim, bool(cfg.selector),
              int(cfg.scan_unroll), cfg.compute_dtype)
    return fused_sequence(static, hw, params["Wc"], params["U_att"],
                          params["c_att"], params["b_sel"], sc.ctx,
                          sc.pctx, sc.ctx_mask, state0.h, state0.c,
                          x_pre_all_tm)
