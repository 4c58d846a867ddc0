"""Cross-platform TPU (Mosaic) lowering checks — no hardware needed.

jax.export runs the full Pallas->Mosaic lowering for platform 'tpu'
from a CPU host, catching tiling/layout violations (e.g. second-to-last
block dims not 8-divisible) that interpret-mode tests cannot see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export

from stvd.config import ModelConfig
from stvd.model import kernel as kmod


def _lower_tpu(fn, *args):
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


def test_temporal_kernel_lowers_reference_scale():
    rng = np.random.RandomState(0)
    Bc, nb, K, A, Dc = 64, 5, 28, 1024, 1024
    args = (jnp.asarray(rng.randn(Bc * nb, A), jnp.float32),
            jnp.asarray(rng.randn(Bc * nb, 1), jnp.float32),
            jnp.asarray(rng.randn(Bc, K, A), jnp.float32),
            jnp.asarray(rng.randn(Bc, K, Dc), jnp.float32),
            jnp.ones((Bc, K), jnp.float32),
            jnp.asarray(rng.randn(A, 1), jnp.float32),
            jnp.float32(0.1), jnp.float32(0.2))

    def f(h, b, pctx, ctx, m, u, ca, bs):
        return kmod._attn_core_pallas_call(h, b, pctx, ctx, m, u, ca, bs,
                                           True, False)

    exp = _lower_tpu(f, *args)
    assert len(exp.mlir_module_serialized) > 0


def test_spatial_kernel_lowers_reference_scale():
    rng = np.random.RandomState(1)
    Bc, nb, K, R, S, Dr = 64, 5, 28, 49, 1024, 1024
    tiles = kmod._pick_spatial_tiles(Bc, K, nb, R, S, Dr)
    assert tiles is not None, "reference scale must fit VMEM"
    args = (jnp.asarray(rng.randn(Bc * nb, S), jnp.float32),
            jnp.asarray(rng.randn(Bc, K, R, S), jnp.float32),
            jnp.asarray(rng.randn(Bc, K, R, Dr), jnp.float32),
            jnp.asarray(rng.randn(S, 1), jnp.float32),
            jnp.float32(0.1))

    def g(h, pregion, regions, u, cs):
        return kmod._spatial_pallas_call(h, pregion, regions, u, cs, False)

    exp = _lower_tpu(g, *args)
    assert len(exp.mlir_module_serialized) > 0


def test_full_beam_decode_step_lowers_for_tpu():
    """The whole decode graph (both fused kernels inside the while_loop)
    lowers for TPU at small-but-structured shapes."""
    from stvd.decode.beam import beam_decode
    from stvd.model.decoder import init_params

    cfg = ModelConfig(n_words=256, dim_word=64, dim=128, ctx_dim=128,
                      n_frames=8, use_spatial=True, n_regions=4,
                      region_dim=128, compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "frames": jnp.asarray(rng.randn(8, 8, 128), jnp.float32),
        "frame_mask": jnp.ones((8, 8), jnp.float32),
        "regions": jnp.asarray(rng.randn(8, 8, 4, 128), jnp.float32),
    }

    def f(params, batch):
        # interpret=False path is selected by backend inside step_pallas;
        # force the compiled path by calling the kernels via export
        return beam_decode(params, cfg, batch, beam_size=4, maxlen=6,
                           step_fn=kmod.step_pallas).tokens

    # NOTE: step_pallas picks interpret by jax.default_backend(), which
    # is 'cpu' here — patch it to force the compiled kernel path into
    # the exported module.
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        exp = _lower_tpu(f, params, batch)
    finally:
        jax.default_backend = orig
    assert len(exp.mlir_module_serialized) > 0
