"""Reference-checkpoint importer (stvd/model/importer.py): Theano
model_best_so_far.npz -> stvd params (reference model_attention.py:
§train saves numpy.savez(unzip(tparams)) — SURVEY.md §5)."""

import os

import jax
import numpy as np
import pytest

from stvd.config import ModelConfig
from stvd.model.decoder import init_params
from stvd.model.importer import (infer_model_config, load_reference_npz,
                                 save_reference_npz)


def small_cfg(**kw):
    base = dict(n_words=50, dim_word=16, dim=24, ctx_dim=20, n_frames=6,
                compute_dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def test_roundtrip_all_params(tmp_path):
    """export under reference names -> import -> identical pytree."""
    cfg = small_cfg(use_spatial=True, region_dim=12, encoder="lstm")
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tmp_path, "model_best_so_far.npz")
    save_reference_npz(path, params)
    got, report = load_reference_npz(path, cfg, strict=True)
    assert not report.missing and not report.unused
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(v),
                                      err_msg=k)


def test_infer_config_from_shapes(tmp_path):
    cfg = small_cfg(use_spatial=True, region_dim=12)
    params = init_params(jax.random.PRNGKey(1), cfg)
    path = os.path.join(tmp_path, "m.npz")
    save_reference_npz(path, params)
    inf = infer_model_config(path)
    assert (inf.n_words, inf.dim_word, inf.dim, inf.ctx_dim) == \
        (50, 16, 24, 20)
    assert inf.use_spatial and inf.region_dim == 12
    assert inf.encoder == "none"


def test_reference_shapes_and_bias_fold(tmp_path):
    """A hand-built npz with the reference's own conventions: decoder_
    prefix, (d,1) column vectors, (1,) scalars, a separate
    ff_logit_ctx_b that must fold into the single pre-tanh bias."""
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    d, dw, dc, da, v = cfg.dim, cfg.dim_word, cfg.ctx_dim, cfg.attn_dim, \
        cfg.n_words
    ref = {
        "Wemb": rng.randn(v, dw), "ff_state_W": rng.randn(dc, d),
        "ff_state_b": rng.randn(d), "ff_memory_W": rng.randn(dc, d),
        "ff_memory_b": rng.randn(d),
        "decoder_W": rng.randn(dw, 4 * d), "decoder_U": rng.randn(d, 4 * d),
        "decoder_b": rng.randn(4 * d), "decoder_Wc": rng.randn(dc, 4 * d),
        "decoder_Wc_att": rng.randn(dc, da), "decoder_b_att": rng.randn(da),
        "decoder_Wd_att": rng.randn(d, da),
        "decoder_U_att": rng.randn(da, 1),           # column vector
        "decoder_c_tt": rng.randn(1),                # (1,) scalar
        "decoder_W_sel": rng.randn(d, 1), "decoder_b_sel": rng.randn(1),
        "ff_logit_lstm_W": rng.randn(d, dw), "ff_logit_lstm_b": rng.randn(dw),
        "ff_logit_ctx_W": rng.randn(dc, dw), "ff_logit_ctx_b": rng.randn(dw),
        "ff_logit_W": rng.randn(dw, v), "ff_logit_b": rng.randn(v),
    }
    path = os.path.join(tmp_path, "ref.npz")
    np.savez(path, **{k: a.astype(np.float32) for k, a in ref.items()})
    got, report = load_reference_npz(path, cfg, strict=True)
    assert "ff_logit_ctx_b" in report.folded and not report.unused
    assert got["U_att"].shape == (da,)
    assert got["c_att"].shape == ()
    np.testing.assert_allclose(
        np.asarray(got["ff_logit_lstm_b"]),
        ref["ff_logit_lstm_b"].astype(np.float32)
        + ref["ff_logit_ctx_b"].astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["W_sel"]),
                                  ref["decoder_W_sel"][:, 0].astype(np.float32))


def test_full_reference_dims_roundtrip_and_decode(tmp_path, monkeypatch):
    """Round-trip at the FULL reference scale (dim 3518, ctx 1024,
    vocab 20k, dim_word 468, spatial 49x1024, motion stream): the
    real-checkpoint-day rehearsal (VERDICT r3 Next #8).  Orthogonal
    init is patched to plain normal — QR of 3518^2 x4 costs minutes on
    this core and the test exercises shapes, not init statistics."""
    import stvd.model.decoder as dec

    monkeypatch.setattr(
        dec, "_ortho_stack",
        lambda rng, nin, blocks, dtype=np.float32:
            dec._norm(rng, (nin, blocks * nin), scale=0.01, dtype=dtype))
    cfg = ModelConfig(n_words=20000, dim_word=468, dim=3518, ctx_dim=1024,
                      n_frames=28, use_spatial=True, n_regions=49,
                      region_dim=1024, use_motion=True,
                      compute_dtype="float32", use_dropout=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tmp_path, "model_best_so_far.npz")
    save_reference_npz(path, params)
    got, report = load_reference_npz(path, cfg, params=params, strict=True)
    # motion-fusion weights are stvd additions with no reference analog
    # — strict import must tolerate exactly those and nothing else
    assert set(report.missing) <= {"W_app", "W_mot", "b_fuse"}
    assert not report.unused
    for k, v in params.items():
        if k in report.missing:
            continue
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(v),
                                      err_msg=k)
    # the imported tree must be decodable as-is (shape/dtype sanity the
    # array compare can't prove): one short greedy decode
    from stvd.decode.greedy import greedy_decode
    rng = np.random.RandomState(0)
    batch = {
        "frames": rng.randn(1, 28, 1024).astype(np.float32) * 0.1,
        "frame_mask": np.ones((1, 28), np.float32),
        "regions": rng.randn(1, 28, 49, 1024).astype(np.float32) * 0.1,
        "motion": rng.randn(1, 28, cfg.motion_dim).astype(np.float32) * 0.1,
    }
    out = greedy_decode(got, cfg, batch, maxlen=3)
    assert out.tokens.shape == (1, 3)

    # config inference recovers the full-dims architecture from shapes
    inf = infer_model_config(path)
    assert (inf.n_words, inf.dim_word, inf.dim, inf.ctx_dim) == \
        (20000, 468, 3518, 1024)
    assert inf.use_spatial and inf.region_dim == 1024


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_alias_fuzz_import(tmp_path, seed):
    """Fuzz over the Theano name-variant space: every param saved under
    a RANDOMLY chosen alias (decoder_/bo_lstm_/spatial_ lineages) and a
    randomly chosen legacy shape convention (column vectors / (1,)
    scalars vs squeezed), must import completely."""
    from stvd.model.importer import _ALIASES

    cfg = small_cfg(use_spatial=True, region_dim=12, encoder="lstm")
    params = init_params(jax.random.PRNGKey(10 + seed), cfg)
    rng = np.random.RandomState(seed)
    ref = {}
    for name, arr in params.items():
        cands = _ALIASES.get(name)
        if not cands:
            continue                      # stvd-only params stay out
        a = np.asarray(arr, np.float32)
        if name in ("U_att", "W_sel", "Us_att") and rng.rand() < 0.5:
            a = a[:, None]                # legacy column-vector form
        elif name in ("c_att", "b_sel", "cs_att") and a.ndim == 0 \
                and rng.rand() < 0.5:
            a = a.reshape(1)              # legacy (1,) scalar form
        ref[cands[rng.randint(len(cands))]] = a
    path = os.path.join(tmp_path, f"fuzz{seed}.npz")
    np.savez(path, **ref)
    got, report = load_reference_npz(path, cfg, strict=True)
    assert not report.missing and not report.unused, report
    for k, v in params.items():
        np.testing.assert_array_equal(
            np.asarray(got[k]).reshape(np.asarray(v).shape),
            np.asarray(v), err_msg=k)


def test_shape_mismatch_raises(tmp_path):
    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tmp_path, "m.npz")
    save_reference_npz(path, params)
    with pytest.raises(ValueError, match="shape"):
        load_reference_npz(path, small_cfg(dim=32))


def test_convert_cli_builds_runnable_run_dir(tmp_path):
    """--ref-model produces a run dir Captioner.from_run_dir loads and
    decodes from (the end-to-end migration path)."""
    import pickle

    from stvd.api import Captioner
    from stvd.cli.convert import main as convert_main

    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(2), cfg)
    npz = os.path.join(tmp_path, "model_best_so_far.npz")
    save_reference_npz(npz, params)
    # legacy worddict: word -> id, ids 0/1 reserved (EOS/UNK)
    wd = {f"w{i}": i for i in range(2, 40)}
    wpath = os.path.join(tmp_path, "worddict.pkl")
    with open(wpath, "wb") as f:
        pickle.dump(wd, f, protocol=2)
    run_dir = os.path.join(tmp_path, "imported")
    assert convert_main(["--ref-model", npz, "--worddict", wpath,
                         "--run-dir", run_dir]) == 0
    cap = Captioner.from_run_dir(run_dir)
    feats = np.random.RandomState(0).randn(2, cfg.n_frames, cfg.ctx_dim)
    texts = cap.caption(feats.astype(np.float32))
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_captioner_quant_override(tmp_path):
    """Captioner.from_run_dir(quant='int8') decodes through the W8A8
    path regardless of the saved config."""
    from stvd.api import Captioner
    from stvd.cli.convert import main as convert_main

    cfg = small_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    npz = os.path.join(tmp_path, "m.npz")
    save_reference_npz(npz, params)
    run_dir = os.path.join(tmp_path, "r")
    assert convert_main(["--ref-model", npz, "--run-dir", run_dir]) == 0
    import pickle
    with open(os.path.join(run_dir, "vocab.pkl"), "wb") as f:
        pickle.dump({f"w{i}": i for i in range(2, 40)}, f, protocol=2)
    cap = Captioner.from_run_dir(run_dir, quant="int8")
    assert cap.cfg.model.decode_quant == "int8"
    feats = np.zeros((1, cfg.n_frames, cfg.ctx_dim), np.float32)
    assert len(cap.caption(feats)) == 1
