"""Hand-derived sequence VJP (model/seqgrad.py) vs autodiff parity.

The fused path must be a pure implementation detail: identical forward
values and identical gradients for EVERY parameter, at float32 exactly
and at bfloat16 loosely (same rounding class as autodiff's own mixed
precision).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stvd.data.batching import gather_batch, synthetic_dataset
from stvd.model.decoder import forward_train, init_params
from stvd.train.loss import loss_fn

from conftest import small_cfg


def _setup(cfg, n=4, seed=0, ragged_mask=False):
    ds = synthetic_dataset(n_videos=n, k=cfg.n_frames, d=cfg.ctx_dim,
                           maxlen=10, seed=seed)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(n, dtype=np.int32))
    if ragged_mask:
        fm = np.asarray(batch["frame_mask"]).copy()
        fm[0, cfg.n_frames // 2:] = 0.0       # half-masked video
        fm[1, 1:] = 0.0                       # single-frame video
        batch["frame_mask"] = jnp.asarray(fm)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return params, batch


def _cfg(**kw):
    base = dict(compute_dtype="float32", fused_seq_grad=True)
    base.update(kw)
    return small_cfg(**base)


@pytest.mark.parametrize("selector", [True, False])
def test_forward_parity_f32(selector):
    cfg = _cfg(selector=selector)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup(cfg, ragged_mask=True)
    a = forward_train(params, cfg, batch, train=False)
    b = forward_train(params, cfg_ref, batch, train=False)
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.alphas), np.asarray(b.alphas),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.nll_per_example),
                               np.asarray(b.nll_per_example), rtol=1e-5)


@pytest.mark.parametrize("selector", [True, False])
def test_grad_parity_f32_all_params(selector):
    """Every parameter's gradient matches autodiff exactly at f32 —
    including the ones the custom VJP computes by hand (U, Wd_att,
    W_sel via d[hw]; Wc; U_att; c_att; b_sel; Wc_att/b_att via d[pctx];
    W/b/Wemb via d[x_pre]; ff_state/ff_memory via d[h0/c0])."""
    cfg = _cfg(selector=selector)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_grad_parity_alpha_c_regularizer():
    """alpha_c > 0 feeds a nonzero cotangent into the alphas output."""
    cfg = _cfg(alpha_c=0.5)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U_att", "Wd_att", "U", "Wc_att"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_grad_parity_bf16_loose():
    """bfloat16 compute: same rounding class as autodiff (the wgrad
    GEMMs accumulate in f32 on the MXU, like XLA's per-step dots)."""
    cfg = _cfg(compute_dtype="bfloat16")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U", "Wc", "W", "Wemb", "U_att", "ff_logit_W"):
        a, b = np.asarray(g_new[k], np.float32), np.asarray(g_ref[k],
                                                            np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, k


# ---------------------------------------------------------------------------
# Pallas forward attention core (train_fwd_kernel='on'):
# kernel.attention_core_pallas inside the fused-VJP forward scan,
# interpret mode on CPU.  Must be invisible: identical forward values
# and gradients vs plain autodiff (the backward recomputes e from
# pctx + h_att regardless of which core produced the forward).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("selector", [True, False])
def test_fwd_kernel_forward_parity_f32(selector):
    cfg = _cfg(selector=selector, train_fwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off")
    params, batch = _setup(cfg, ragged_mask=True)
    a = forward_train(params, cfg, batch, train=False)
    b = forward_train(params, cfg_ref, batch, train=False)
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.alphas), np.asarray(b.alphas),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("selector", [True, False])
def test_fwd_kernel_grad_parity_f32(selector):
    """Kernelized forward + hand backward vs plain autodiff, every
    parameter, f32 exact."""
    cfg = _cfg(selector=selector, train_fwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off")
    params, batch = _setup(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_fwd_kernel_alpha_c():
    """alpha_c's dalphas cotangent routes through the hand backward
    identically whichever core produced the forward alphas."""
    cfg = _cfg(alpha_c=0.5, train_fwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off")
    params, batch = _setup(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U_att", "Wd_att", "U", "Wc_att"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_ss_falls_back_to_autodiff():
    """Scheduled sampling keeps the autodiff path (fused_seq_grad must
    not change its results or crash)."""
    cfg2 = _cfg()
    params2, batch2 = _setup(cfg2)
    loss2, _ = loss_fn(params2, cfg2, batch2, jax.random.PRNGKey(0),
                       train=True, ss_prob=0.3)
    assert np.isfinite(float(loss2))


# ---------------------------------------------------------------------------
# Spatial path (config 2): fused_sequence_spatial vs autodiff
# ---------------------------------------------------------------------------

def _setup_spatial(cfg, n=4, seed=0, ragged_mask=False):
    ds = synthetic_dataset(n_videos=n, k=cfg.n_frames, d=cfg.ctx_dim,
                           n_regions=cfg.n_regions,
                           region_dim=cfg.region_dim, maxlen=10, seed=seed)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(n, dtype=np.int32))
    if ragged_mask:
        fm = np.asarray(batch["frame_mask"]).copy()
        fm[0, cfg.n_frames // 2:] = 0.0
        fm[1, 1:] = 0.0
        batch["frame_mask"] = jnp.asarray(fm)
    params = init_params(jax.random.PRNGKey(7), cfg)
    return params, batch


def _scfg(**kw):
    base = dict(compute_dtype="float32", fused_seq_grad=True,
                use_spatial=True, n_regions=3, region_dim=8)
    base.update(kw)
    return small_cfg(**base)


@pytest.mark.parametrize("selector", [True, False])
def test_spatial_forward_parity_f32(selector):
    cfg = _scfg(selector=selector)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup_spatial(cfg, ragged_mask=True)
    a = forward_train(params, cfg, batch, train=False)
    b = forward_train(params, cfg_ref, batch, train=False)
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.alphas), np.asarray(b.alphas),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("selector", [True, False])
def test_spatial_grad_parity_f32_all_params(selector):
    """Every parameter's gradient matches autodiff at f32 — including
    the spatial leaves the custom VJP computes by hand (Us_att/cs_att;
    W_spat_fuse via BOTH its direct arg and the w_sf_att composition;
    Ws_att/bs_att via d[pregion]; Wsd_att via d[hw])."""
    cfg = _scfg(selector=selector)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup_spatial(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_spatial_grad_parity_alpha_c():
    cfg = _scfg(alpha_c=0.5)
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup_spatial(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("Us_att", "Wsd_att", "Ws_att", "W_spat_fuse", "U_att", "U"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_spatial_grad_parity_bf16_loose():
    """bfloat16 compute: the fused spatial VJP reads pregion in bf16
    inside the scan (the oracle keeps it f32), so tolerance is the
    mixed-precision rounding class, not exactness."""
    cfg = _scfg(compute_dtype="bfloat16")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False)
    params, batch = _setup_spatial(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U", "Wc", "Us_att", "Ws_att", "W_spat_fuse", "Wsd_att"):
        a, b = np.asarray(g_new[k], np.float32), np.asarray(g_ref[k],
                                                            np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, k


# ---------------------------------------------------------------------------
# Fused Pallas backward-spatial kernel (spatial_bwd_kernel='on'):
# kernel.spatial_bwd_pallas inside the reverse scan, interpret mode on
# CPU.  Must be invisible: identical gradients vs plain autodiff.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("selector", [True, False])
def test_spatial_bwd_kernel_grad_parity_f32(selector):
    """Kernelized spatial VJP vs autodiff, every parameter, f32 exact —
    including the spat-carry restructuring (the kernel computes step
    t-1's spat from the VMEM-resident regions block)."""
    cfg = _scfg(selector=selector, spatial_bwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  spatial_bwd_kernel="off")
    params, batch = _setup_spatial(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_spatial_bwd_kernel_matches_jnp_fused_bf16():
    """bf16 compute + bf16 Dpe accumulator: the kernel path must stay in
    the same rounding class as the jnp fused path (identical Dpe
    accumulator math; reduction orders may differ)."""
    cfg_k = _scfg(compute_dtype="bfloat16", spatial_bwd_kernel="on")
    cfg_j = dataclasses.replace(cfg_k, spatial_bwd_kernel="off")
    params, batch = _setup_spatial(cfg_k)
    g_k = jax.grad(lambda p: loss_fn(p, cfg_k, batch, train=False)[0]
                   )(params)
    g_j = jax.grad(lambda p: loss_fn(p, cfg_j, batch, train=False)[0]
                   )(params)
    for k in ("U", "Wc", "Us_att", "Ws_att", "W_spat_fuse", "Wsd_att",
              "bs_att", "cs_att"):
        a, b = np.asarray(g_k[k], np.float32), np.asarray(g_j[k],
                                                          np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.02, k


def test_spatial_bwd_kernel_alpha_c():
    """alpha_c feeds dalphas into the scan; the kernel path must route
    them identically (they enter via dspat, upstream of the kernel)."""
    cfg = _scfg(alpha_c=0.5, spatial_bwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  spatial_bwd_kernel="off")
    params, batch = _setup_spatial(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("Us_att", "Wsd_att", "Ws_att", "W_spat_fuse", "U_att", "U"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("selector", [True, False])
def test_spatial_fwd_kernel_grad_parity_f32(selector):
    """train_fwd_kernel='on' in the SPATIAL fused VJP: the Pallas
    temporal core runs over the per-step ctx_k/pctx_k; every
    parameter's gradient must still match plain autodiff at f32."""
    cfg = _scfg(selector=selector, train_fwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off")
    params, batch = _setup_spatial(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_spatial_fwd_kernel_with_bwd_kernel_f32():
    """Both scan kernels at once (the TPU 'auto' production config for
    config 2): forward attention core + backward-spatial kernel."""
    cfg = _scfg(train_fwd_kernel="on", spatial_bwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off",
                                  spatial_bwd_kernel="off")
    params, batch = _setup_spatial(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_spatial_fused_trains():
    """End-to-end: optimizer steps reduce the loss on the spatial path."""
    from stvd.config import TrainConfig
    from stvd.train.loop import init_train_state, make_train_step
    cfg = _scfg()
    params, batch = _setup_spatial(cfg, n=8)
    batch = dict(batch)
    batch["weight"] = jnp.ones((8,), jnp.float32)
    tcfg = TrainConfig(batch_size=8, maxlen=10, optimizer="adam", lr=1e-3)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    state, m0 = step(state, batch)
    for _ in range(20):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_fused_seq_grad_trains():
    """End-to-end: a few optimizer steps reduce the loss (integration
    with make_train_step + adadelta)."""
    from stvd.config import TrainConfig
    from stvd.train.loop import init_train_state, make_train_step
    cfg = _cfg()
    params, batch = _setup(cfg, n=8)
    batch = dict(batch)
    batch["weight"] = jnp.ones((8,), jnp.float32)
    tcfg = TrainConfig(batch_size=8, maxlen=10, optimizer="adam", lr=1e-3)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    state, m0 = step(state, batch)
    for _ in range(20):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_fwd_kernel_grad_parity_bf16_loose():
    """train_fwd_kernel='on' at bfloat16 (the TPU production numeric
    config if battery 11/12 flips the default): same rounding class as
    the bf16 jnp body."""
    cfg = _cfg(compute_dtype="bfloat16", train_fwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off")
    params, batch = _setup(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U", "Wc", "W", "U_att", "Wc_att", "Wd_att"):
        a, b = np.asarray(g_new[k], np.float32), np.asarray(g_ref[k],
                                                            np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, k


def test_spatial_fwd_kernel_grad_parity_bf16_loose():
    """Spatial path, both kernels, bfloat16: the full config-2 TPU
    production candidate."""
    cfg = _scfg(compute_dtype="bfloat16", train_fwd_kernel="on",
                spatial_bwd_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_fwd_kernel="off",
                                  spatial_bwd_kernel="off")
    params, batch = _setup_spatial(cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in ("U", "Wc", "Us_att", "Ws_att", "W_spat_fuse", "U_att"):
        a, b = np.asarray(g_new[k], np.float32), np.asarray(g_ref[k],
                                                            np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, k


# ---- fused train-scan tail (model.train_tail_kernel) -----------------------

def _tcfg(**kw):
    """Lane-aligned dims — the tail kernel needs dim/ctx_dim % 128
    (default test dims decline to the inline path by design)."""
    base = dict(compute_dtype="float32", fused_seq_grad=True,
                dim=128, ctx_dim=128, train_tail_kernel="on")
    base.update(kw)
    return small_cfg(**base)


@pytest.mark.parametrize("selector", [True, False])
def test_tail_kernel_forward_parity_f32(selector):
    """Fused Wc+pointwise tail == the inline jnp tail (identical
    residual contract), temporal path."""
    cfg = _tcfg(selector=selector)
    cfg_ref = dataclasses.replace(cfg, train_tail_kernel="off")
    params, batch = _setup(cfg, ragged_mask=True)
    a = forward_train(params, cfg, batch, train=False)
    b = forward_train(params, cfg_ref, batch, train=False)
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.alphas), np.asarray(b.alphas),
                               rtol=1e-5, atol=1e-6)


def test_tail_kernel_grad_parity_f32():
    """The kernel emits the exact residuals the hand-derived backward
    consumes — gradients must match plain autodiff for every param."""
    cfg = _tcfg()
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_tail_kernel="off")
    params, batch = _setup(cfg, ragged_mask=True)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    assert set(g_new) == set(g_ref)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tail_kernel_spatial_grad_parity_f32():
    cfg = small_cfg(compute_dtype="float32", fused_seq_grad=True,
                    dim=128, ctx_dim=128, use_spatial=True, n_regions=4,
                    region_dim=16, train_tail_kernel="on")
    cfg_ref = dataclasses.replace(cfg, fused_seq_grad=False,
                                  train_tail_kernel="off", remat=True)
    ds = synthetic_dataset(n_videos=4, k=cfg.n_frames, d=cfg.ctx_dim,
                           n_regions=4, region_dim=16, maxlen=10, seed=5)
    dev = ds.bank.to_device()
    batch = gather_batch(dev, ds.captions, np.arange(4, dtype=np.int32))
    params = init_params(jax.random.PRNGKey(11), cfg)
    g_new = jax.grad(lambda p: loss_fn(p, cfg, batch, train=False)[0]
                     )(params)
    g_ref = jax.grad(lambda p: loss_fn(p, cfg_ref, batch, train=False)[0]
                     )(params)
    for k in sorted(g_ref):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tail_kernel_declines_unaligned_dims():
    """Default test dims (24/32) don't tile: the kernel declines and
    the fused path still matches autodiff exactly."""
    from stvd.model.kernel import train_tail_pallas
    cfg = _cfg(train_tail_kernel="on")     # dim=24, ctx=32
    params, batch = _setup(cfg)
    wc = params["Wc"]
    assert train_tail_pallas(jnp.zeros((4, cfg.ctx_dim)),
                             jnp.zeros((4, 4 * cfg.dim)),
                             jnp.zeros((4, 4 * cfg.dim)),
                             jnp.zeros((4, cfg.dim)), wc,
                             "float32") is None
    a = forward_train(params, cfg, batch, train=False)
    b = forward_train(params, dataclasses.replace(
        cfg, train_tail_kernel="off"), batch, train=False)
    np.testing.assert_array_equal(np.asarray(a.logits),
                                  np.asarray(b.logits))
