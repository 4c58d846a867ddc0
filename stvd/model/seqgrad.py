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

Scope: teacher forcing (ss_prob=0), any selector/encoder/motion setting
(those live outside the scan).  ``fused_sequence`` covers the temporal
model; ``fused_sequence_spatial`` (below) covers config 2's spatial
path.  Reference: the theano ``lstm_cond_layer`` scan this replaces
(``model_attention.py:§build_model`` — SURVEY.md §3.2).

SPATIAL PATH (config 2) — why it gets its own hand VJP: at reference
scale (B=64, K=28, R=49, s=Dr=1024) autodiff's scan transpose carries
fp32 cotangent accumulators for the loop-invariant ``pregion`` AND
``regions`` — 360 MB EACH, read+written every backward step (~43 GB of
HBM traffic per train step just for those two), plus the 235 MB
``hw``-class accumulator, plus remat's full forward recompute.  That is
the measured 6.0 steps/s of runs/msvd_r2_long.  The hand VJP keeps ONE
big accumulator (``Σ_t dpe_s``, the pregion cotangent — irreducible:
every step touches all of it, and flushing it per-step as a GEMM would
cost 184 GFLOP/step), carries it in ``wgrad_dtype``, rebuilds the
``regions`` cotangent post-scan from stacked small tensors (a dead-code
path XLA eliminates when — as always in training — nothing consumes
d(regions)), and recovers all weight gradients as post-scan GEMMs over
stacked per-step cotangents.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .step import _attention_core_jnp, _dot, masked_softmax

# (dim, attn, selector, unroll, cd, use_attn_kernel[, use_tail_kernel])
Static = Tuple[int, int, bool, int, str, bool, bool]


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
    dim, attn, selector, unroll, cd, use_attn_kernel = static[:6]
    use_tail_kernel = static[6] if len(static) > 6 else False
    cdtype = jnp.dtype(cd)
    if use_attn_kernel:
        # Pallas temporal-attention core (tanh-score + masked softmax +
        # ctx reduce + selector in ONE kernel) — same contract as the
        # inline jnp block (`step._attention_core_jnp`); chosen because
        # the forward scan's cost over its streaming floor is per-fusion
        # dependency latency (cfg.train_fwd_kernel, BASELINE.md).  The
        # backward is untouched: it recomputes e from pctx + h_att.
        from . import kernel as kernel_mod
        attention_core = kernel_mod.attention_core_pallas
    else:
        attention_core = _attention_core_jnp

    def body(carry, x_pre_t):
        h, c = carry
        hp = _dot(h, hw, cdtype)                     # (B, 4d+attn+1)
        h_gates = hp[:, : 4 * dim]
        h_att = hp[:, 4 * dim: 4 * dim + attn]
        blogit = hp[:, 4 * dim + attn]
        ctx_t, alpha = attention_core(h_att, blogit, pctx, ctx, ctx_mask,
                                      u_att, c_att, b_sel, selector)
        out = None
        if use_tail_kernel:
            # fused Wc-matmul + adds + LSTM pointwise in ONE launch
            # (cfg.train_tail_kernel — the whole-step-tail experiment);
            # residual contract identical, backward untouched
            from . import kernel as kernel_mod
            out = kernel_mod.train_tail_pallas(ctx_t, x_pre_t, h_gates,
                                               c, wc, cd)
        if out is not None:
            h_t, c_t, preact = out
        else:
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
    dim, attn, selector, unroll, cd = static[:5]
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


# ---------------------------------------------------------------------------
# Spatial path (config 2): region attention inside the scan
# ---------------------------------------------------------------------------

# (dim, attn, s_attn, selector, unroll, compute_dtype, acc_dtype,
#  use_bwd_kernel, use_attn_kernel)
SpatialStatic = Tuple[int, int, int, bool, int, str, str, bool, bool]


def _spatial_step_fwd(h_satt, h_att, pregion_c, regions_c, ctx,
                      pctx, ctx_mask, u_s, c_s, w_sf, w_sfa, u32, c_att,
                      cdtype):
    """Shared forward core for one spatial step (used by both scans).

    Mirrors ``step._spatial_core_jnp`` + the spatial branch of
    ``step.step_with_core`` at nb=1, with one deviation: ``pregion`` is
    pre-cast to compute dtype ONCE outside the scan (``pregion_c``), so
    at bfloat16 the 360 MB/step read halves; exact at float32.
    Returns (alpha_s, spat, ctx_k, pctx_k, e, alpha, ctx_t_raw).
    """
    e_s = jnp.tanh(pregion_c + h_satt.astype(cdtype)[:, None, None, :])
    ss = jnp.einsum("bkrd,d->bkr", e_s, u_s.astype(cdtype)) + c_s
    alpha_s = masked_softmax(ss.astype(jnp.float32), None, axis=-1)
    spat = jnp.einsum("bkr,bkrd->bkd", alpha_s.astype(cdtype), regions_c)
    ctx_k = ctx + _dot(spat, w_sf, cdtype)            # (B, K, Dc) f32
    pctx_k = pctx + _dot(spat, w_sfa, cdtype)         # (B, K, A)  f32
    e = jnp.tanh(pctx_k + h_att[:, None, :])
    scores = jnp.einsum("bkd,d->bk", e, u32) + c_att
    alpha = masked_softmax(scores.astype(jnp.float32), ctx_mask, axis=-1)
    ctx_t = jnp.einsum("bk,bkd->bd", alpha.astype(ctx_k.dtype), ctx_k)
    return alpha_s, spat, ctx_k, pctx_k, e, alpha, ctx_t.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_sequence_spatial(static: SpatialStatic, hw, wc, u_att, c_att,
                           b_sel, u_s, c_s, w_sf, w_sfa, ctx, pctx,
                           pregion, regions, ctx_mask, h0, c0, x_pre_all):
    """Teacher-forced decoder scan WITH spatial region attention.

    Array args mirror ``fused_sequence`` plus the spatial leaves:
    ``u_s``/``c_s`` (region-score vector + bias), ``w_sf``
    (W_spat_fuse), ``w_sfa`` (the precomputed W_spat_fuse @ Wc_att
    composition), ``pregion`` (regions @ Ws_att + bs_att, hoisted by
    ``step.precompute``), ``regions``.  The custom VJP emits a
    cotangent for each; the outer autodiff routes d[pregion] to
    Ws_att/bs_att, d[w_sfa] through the composition to W_spat_fuse and
    Wc_att, etc.  Returns (hs, ctxs, alphas) time-major.
    """
    out, _ = _fwd_spatial(static, hw, wc, u_att, c_att, b_sel, u_s, c_s,
                          w_sf, w_sfa, ctx, pctx, pregion, regions,
                          ctx_mask, h0, c0, x_pre_all)
    return out


def _fwd_spatial(static, hw, wc, u_att, c_att, b_sel, u_s, c_s, w_sf,
                 w_sfa, ctx, pctx, pregion, regions, ctx_mask, h0, c0,
                 x_pre_all):
    dim, attn, s_attn, selector, unroll, cd = static[:6]
    use_attn_kernel = static[8] if len(static) > 8 else False
    use_tail_kernel = static[9] if len(static) > 9 else False
    cdtype = jnp.dtype(cd)
    u32 = u_att.astype(pctx.dtype)
    pregion_c = pregion.astype(cdtype)
    regions_c = regions.astype(cdtype)
    # imported at FUNCTION scope: body's branches reference kernel_mod
    # (a local import inside body would shadow it per-branch)
    from . import kernel as kernel_mod

    def body(carry, x_pre_t):
        h, c = carry
        hp = _dot(h, hw, cdtype)            # (B, 4d+attn+1+s)
        h_gates = hp[:, : 4 * dim]
        h_att = hp[:, 4 * dim: 4 * dim + attn]
        blogit = hp[:, 4 * dim + attn]
        h_satt = hp[:, 4 * dim + attn + 1:]
        if use_attn_kernel:
            # region stage verbatim from _spatial_step_fwd, then the
            # Pallas temporal core over the per-step ctx_k/pctx_k
            # (selector applied inside the core, same saved ys)
            e_s = jnp.tanh(pregion_c
                           + h_satt.astype(cdtype)[:, None, None, :])
            ss = jnp.einsum("bkrd,d->bkr", e_s,
                            u_s.astype(cdtype)) + c_s
            alpha_s = masked_softmax(ss.astype(jnp.float32), None,
                                     axis=-1)
            spat = jnp.einsum("bkr,bkrd->bkd", alpha_s.astype(cdtype),
                              regions_c)
            ctx_k = ctx + _dot(spat, w_sf, cdtype)
            pctx_k = pctx + _dot(spat, w_sfa, cdtype)
            ctx_t, alpha = kernel_mod.attention_core_pallas(
                h_att, blogit, pctx_k, ctx_k, ctx_mask, u_att, c_att,
                b_sel, selector)
        else:
            alpha_s, _, _, _, _, alpha, ctx_t = _spatial_step_fwd(
                h_satt, h_att, pregion_c, regions_c, ctx, pctx,
                ctx_mask, u_s, c_s, w_sf, w_sfa, u32, c_att, cdtype)
            if selector:
                beta = jax.nn.sigmoid(blogit.astype(jnp.float32) + b_sel)
                ctx_t = ctx_t * beta[:, None]
        out = None
        if use_tail_kernel:
            out = kernel_mod.train_tail_pallas(ctx_t, x_pre_t, h_gates,
                                               c, wc, cd)
        if out is not None:
            h_t, c_t, preact = out
        else:
            preact = x_pre_t + h_gates + _dot(ctx_t, wc, cdtype)
            i, f, o, g = _gates(preact, dim)
            c_t = f * c + i * g
            h_t = o * jnp.tanh(c_t)
        return ((h_t, c_t),
                (h_t, c_t, ctx_t, alpha, preact, h_att, blogit, h_satt,
                 alpha_s))

    (_, _), ys = jax.lax.scan(body, (h0, c0), x_pre_all, unroll=unroll)
    hs, cs, ctxs, alphas, preacts, h_atts, blogits, h_satts, alpha_ss = ys
    res = (hw, wc, u_att, c_att, b_sel, u_s, c_s, w_sf, w_sfa, ctx, pctx,
           pregion, regions, ctx_mask, h0, c0,
           hs, cs, ctxs, alphas, preacts, h_atts, blogits, h_satts,
           alpha_ss)
    return (hs, ctxs, alphas), res


def _bwd_spatial(static, res, g):
    (dim, attn, s_attn, selector, unroll, cd, acc_dt,
     use_kernel) = static[:8]
    cdtype = jnp.dtype(cd)
    adtype = jnp.dtype(acc_dt)
    (hw, wc, u_att, c_att, b_sel, u_s, c_s, w_sf, w_sfa, ctx, pctx,
     pregion, regions, ctx_mask, h0, c0,
     hs, cs, ctxs, alphas, preacts, h_atts, blogits, h_satts,
     alpha_ss) = res
    dhs, dctxs, dalphas = g
    T, B = hs.shape[0], hs.shape[1]
    K, R = regions.shape[1], regions.shape[2]

    if use_kernel:
        # fused Pallas backward-spatial step (kernel.spatial_bwd_pallas):
        # e_s recompute + softmax backward + Dpe in-place accumulate in
        # one VMEM pass, plus the next step's spat from the regions
        # block already resident.  Falls back to the jnp path when no
        # tiling fits VMEM.
        from . import kernel as kernel_mod
        if kernel_mod._pick_spatial_bwd_tile(
                B, K, R, pregion.shape[3], regions.shape[3],
                cdtype.itemsize, adtype.itemsize) is None:
            use_kernel = False

    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    wc_t = wc.T
    hw_t = hw.T
    w_sf_t = w_sf.T
    w_sfa_t = w_sfa.T
    u32 = u_att.astype(pctx.dtype)
    u_s_c = u_s.astype(cdtype)
    mask_f = (ctx_mask > 0).astype(jnp.float32)
    pregion_c = pregion.astype(cdtype)
    regions_c = regions.astype(cdtype)

    def body(carry, xs):
        if use_kernel:
            (dh, dc, du_att, dc_att, db_sel, du_s, dc_s, dpctx, dctx,
             dpe_s_acc, dw_sf, dw_sfa, spat) = carry
            (hp_t, cp_t, c_t, ctx_t, alpha, preact, h_att, blogit, h_satt,
             alpha_s, alpha_prev, dh_out, dctx_out, dalpha_out) = xs
        else:
            (dh, dc, du_att, dc_att, db_sel, du_s, dc_s, dpctx, dctx,
             dpe_s_acc, dw_sf, dw_sfa) = carry
            (hp_t, cp_t, c_t, ctx_t, alpha, preact, h_att, blogit, h_satt,
             alpha_s, dh_out, dctx_out, dalpha_out) = xs

            # ---- recompute the step's big intermediates (cheaper than
            # saving them: e_s alone is (B,K,R,s) = 360 MB/step) ----
            e_s = jnp.tanh(pregion_c
                           + h_satt.astype(cdtype)[:, None, None, :])
            spat = jnp.einsum("bkr,bkrd->bkd", alpha_s.astype(cdtype),
                              regions_c)
        ctx_k = ctx + _dot(spat, w_sf, cdtype)
        pctx_k = pctx + _dot(spat, w_sfa, cdtype)
        e = jnp.tanh(pctx_k + h_att[:, None, :])

        # ---- LSTM cell backward ----
        dh_tot = dh + dh_out
        i, f, o, gg = _gates(preact, dim)
        tc = jnp.tanh(c_t)
        dct = dc + dh_tot * o * (1.0 - tc * tc)
        do = dh_tot * tc
        dpre = jnp.concatenate(
            [dct * gg * i * (1.0 - i),
             dct * cp_t * f * (1.0 - f),
             do * o * (1.0 - o),
             dct * i * (1.0 - gg * gg)], axis=1)
        dc_prev = dct * f

        # ---- context / selector backward ----
        dctx_t = dctx_out + jnp.dot(dpre.astype(cdtype), wc_t,
                                    preferred_element_type=jnp.float32)
        ctxw = jnp.einsum("bk,bkd->bd", alpha.astype(ctx_k.dtype),
                          ctx_k).astype(jnp.float32)
        if selector:
            beta = jax.nn.sigmoid(blogit.astype(jnp.float32) + b_sel)
            dbeta = jnp.sum(dctx_t * ctxw, axis=1)
            dcw = dctx_t * beta[:, None]
            dblogit = dbeta * beta * (1.0 - beta)
            db_sel = db_sel + jnp.sum(dblogit)
        else:
            dcw = dctx_t
            dblogit = jnp.zeros((B,), jnp.float32)

        # ---- temporal attention backward (over the per-step ctx_k) ----
        dalpha = (jnp.einsum("bd,bkd->bk", dcw, ctx_k.astype(jnp.float32))
                  + dalpha_out)
        dck = (alpha[:, :, None] * dcw[:, None, :])          # (B,K,Dc)
        ds = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=1,
                                       keepdims=True))
        ds = ds * mask_f
        dc_att = dc_att + jnp.sum(ds)
        du_att = du_att + jnp.einsum("bk,bka->a", ds,
                                     e.astype(jnp.float32))
        dpe = (ds[:, :, None] * u32).astype(e.dtype) * (1.0 - e * e)
        dpk = dpe                                            # (B,K,A)
        dh_att = jnp.sum(dpe, axis=1)

        # ---- ctx_k / pctx_k fan-in: invariant accumulators + spat ----
        dctx = dctx + dck
        dpctx = dpctx + dpk
        dck_f = dck.reshape(B * K, -1).astype(cdtype)
        dpk_f = dpk.reshape(B * K, -1).astype(cdtype)
        sp_f = spat.reshape(B * K, -1).astype(cdtype)
        dw_sf = dw_sf + jnp.dot(sp_f.T, dck_f,
                                preferred_element_type=jnp.float32)
        dw_sfa = dw_sfa + jnp.dot(sp_f.T, dpk_f,
                                  preferred_element_type=jnp.float32)
        dspat = (jnp.dot(dck_f, w_sf_t.astype(cdtype),
                         preferred_element_type=jnp.float32)
                 + jnp.dot(dpk_f, w_sfa_t.astype(cdtype),
                           preferred_element_type=jnp.float32)
                 ).reshape(B, K, -1)                         # (B,K,Dr) f32

        # ---- spatial attention backward ----
        if use_kernel:
            dpe_s_acc, dh_satt, du_c, dss, spat_prev = \
                kernel_mod.spatial_bwd_pallas(
                    h_satt, pregion_c, regions_c, alpha_s, alpha_prev,
                    dspat, u_s, dpe_s_acc, cd)
            du_s = du_s + du_c
            dc_s = dc_s + jnp.sum(dss)
        else:
            dalpha_s = jnp.einsum("bkd,bkrd->bkr", dspat.astype(cdtype),
                                  regions_c,
                                  preferred_element_type=jnp.float32)
            dss = alpha_s * (dalpha_s - jnp.sum(alpha_s * dalpha_s,
                                                axis=-1,
                                                keepdims=True))  # (B,K,R)
            dc_s = dc_s + jnp.sum(dss)
            du_s = du_s + jnp.einsum("bkr,bkrd->d", dss.astype(cdtype),
                                     e_s,
                                     preferred_element_type=jnp.float32)
            dpe_s = ((dss[:, :, :, None].astype(cdtype) * u_s_c)
                     * (1.0 - e_s * e_s))                  # (B,K,R,s) cd
            dpe_s_acc = dpe_s_acc + dpe_s.astype(adtype)
            dh_satt = jnp.sum(dpe_s, axis=(1, 2)).astype(jnp.float32)

        # ---- h-projection backward ----
        dhp = jnp.concatenate(
            [dpre, dh_att.astype(jnp.float32), dblogit[:, None], dh_satt],
            axis=1)
        dh_prev = jnp.dot(dhp.astype(cdtype), hw_t,
                          preferred_element_type=jnp.float32)
        new_carry = (dh_prev, dc_prev, du_att, dc_att, db_sel, du_s, dc_s,
                     dpctx, dctx, dpe_s_acc, dw_sf, dw_sfa)
        if use_kernel:
            new_carry = new_carry + (spat_prev,)
        return new_carry, (dhp, dspat.astype(cdtype))

    carry0 = (jnp.zeros_like(h0), jnp.zeros_like(c0),
              jnp.zeros((attn,), jnp.float32), jnp.zeros((), jnp.float32),
              jnp.zeros((), jnp.float32),
              jnp.zeros((s_attn,), jnp.float32), jnp.zeros((), jnp.float32),
              jnp.zeros(pctx.shape, jnp.float32),
              jnp.zeros(ctx.shape, jnp.float32),
              jnp.zeros(pregion.shape, adtype),
              jnp.zeros(w_sf.shape, jnp.float32),
              jnp.zeros(w_sfa.shape, jnp.float32))
    xs = (h_prev, c_prev, cs, ctxs, alphas, preacts, h_atts, blogits,
          h_satts, alpha_ss, dhs, dctxs, dalphas)
    if use_kernel:
        # spat for the first (t = T-1) backward step; later steps get it
        # from the kernel's in-VMEM recompute at t+1
        spat_init = jnp.einsum("bkr,bkrd->bkd",
                               alpha_ss[-1].astype(cdtype), regions_c)
        carry0 = carry0 + (spat_init,)
        alpha_prev_st = jnp.concatenate(
            [jnp.zeros_like(alpha_ss[:1]), alpha_ss[:-1]], axis=0)
        xs = (h_prev, c_prev, cs, ctxs, alphas, preacts, h_atts, blogits,
              h_satts, alpha_ss, alpha_prev_st, dhs, dctxs, dalphas)
    final_carry, (dhp_stack, dspat_stack) = \
        jax.lax.scan(body, carry0, xs, reverse=True, unroll=unroll)
    (dh0, dc0, du_att, dc_att, db_sel, du_s, dc_s, dpctx, dctx,
     dpe_s_acc, dw_sf, dw_sfa) = final_carry[:12]

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
    # d(regions) via the spat route, rebuilt from the stacked per-step
    # pieces.  In training nothing consumes d(regions) (features are
    # data), so XLA dead-code-eliminates this einsum AND the
    # dspat_stack emission; correctness is preserved for any caller
    # that does differentiate w.r.t. regions.
    dregions = jnp.einsum("tbkr,tbkd->bkrd", alpha_ss.astype(cdtype),
                          dspat_stack,
                          preferred_element_type=jnp.float32)

    return (dhw, dwc, du_att.astype(u_att.dtype),
            dc_att.astype(jnp.result_type(c_att)),
            db_sel.astype(jnp.result_type(b_sel)),
            du_s.astype(u_s.dtype), dc_s.astype(jnp.result_type(c_s)),
            dw_sf.astype(w_sf.dtype), dw_sfa.astype(w_sfa.dtype),
            dctx.astype(ctx.dtype), dpctx.astype(pctx.dtype),
            dpe_s_acc.astype(pregion.dtype), dregions.astype(regions.dtype),
            jnp.zeros_like(ctx_mask), dh0, dc0, dx_pre)


fused_sequence_spatial.defvjp(_fwd_spatial, _bwd_spatial)


def run(params, cfg, sc, state0, x_pre_all_tm):
    """Adapter: call fused_sequence from decoder.forward_train's fast
    path.  ``x_pre_all_tm`` is time-major (T, B, 4*dim)."""
    from .step import _h_projection_weights
    hw = sc.h_proj_w if sc.h_proj_w is not None \
        else _h_projection_weights(params, cfg)
    # Pallas forward attention core: 'auto' engages on TPU only (on CPU
    # the kernel runs in interpret mode — correct but slow — so tests
    # opt in explicitly with 'on').
    use_attn_kernel = (cfg.train_fwd_kernel == "on"
                       or (cfg.train_fwd_kernel == "auto"
                           and jax.default_backend() == "tpu"))
    use_tail_kernel = (cfg.train_tail_kernel == "on"
                       or (cfg.train_tail_kernel == "auto"
                           and jax.default_backend() == "tpu"))
    static = (cfg.dim, cfg.attn_dim, bool(cfg.selector),
              int(cfg.scan_unroll), cfg.compute_dtype, use_attn_kernel,
              use_tail_kernel)
    return fused_sequence(static, hw, params["Wc"], params["U_att"],
                          params["c_att"], params["b_sel"], sc.ctx,
                          sc.pctx, sc.ctx_mask, state0.h, state0.c,
                          x_pre_all_tm)


def run_spatial(params, cfg, sc, state0, x_pre_all_tm):
    """Adapter: call fused_sequence_spatial from decoder.forward_train's
    fast path (config 2).  ``x_pre_all_tm`` is time-major (T, B, 4d)."""
    from .step import _h_projection_weights
    hw = sc.h_proj_w if sc.h_proj_w is not None \
        else _h_projection_weights(params, cfg)
    # Dpe accumulator dtype: its own knob, decoupled from wgrad_dtype
    # (bf16 measured -23% grad step here, round 3, while the temporal
    # wgrad bf16 path measured NEGATIVE in round 2).  Exact f32 math
    # whenever compute is f32 (the parity-test configuration).
    acc_dt = ("bfloat16" if (cfg.spatial_wgrad_dtype == "bfloat16"
                             and cfg.compute_dtype != "float32")
              else "float32")
    # Fused Pallas backward-spatial step: 'auto' engages on TPU only
    # (on CPU the kernel runs in interpret mode — correct but slow —
    # so tests opt in explicitly with 'on').
    use_kernel = (cfg.spatial_bwd_kernel == "on"
                  or (cfg.spatial_bwd_kernel == "auto"
                      and jax.default_backend() == "tpu"))
    use_attn_kernel = (cfg.train_fwd_kernel == "on"
                       or (cfg.train_fwd_kernel == "auto"
                           and jax.default_backend() == "tpu"))
    use_tail_kernel = (cfg.train_tail_kernel == "on"
                       or (cfg.train_tail_kernel == "auto"
                           and jax.default_backend() == "tpu"))
    static = (cfg.dim, cfg.attn_dim, int(cfg.region_dim),
              bool(cfg.selector), int(cfg.scan_unroll), cfg.compute_dtype,
              acc_dt, use_kernel, use_attn_kernel, use_tail_kernel)
    return fused_sequence_spatial(
        static, hw, params["Wc"], params["U_att"], params["c_att"],
        params["b_sel"], params["Us_att"], params["cs_att"],
        params["W_spat_fuse"], sc.w_sf_att, sc.ctx, sc.pctx, sc.pregion,
        sc.regions, sc.ctx_mask, state0.h, state0.c, x_pre_all_tm)
