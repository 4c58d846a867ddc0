"""High-level Captioner API tests."""

import dataclasses

import jax
import numpy as np
import pytest

from stvd.api import Captioner
from stvd.config import Config, DataConfig, DecodeConfig, ModelConfig, TrainConfig
from stvd.data.batching import synthetic_dataset
from stvd.model.decoder import init_params
from stvd.train.loop import fit

MCFG = ModelConfig(n_words=48, dim_word=16, dim=24, ctx_dim=32, n_frames=6,
                   compute_dtype="float32")


def _vocab():
    return synthetic_dataset(n_videos=2, k=6, d=32, maxlen=8, seed=0).vocab


def test_caption_raw_features():
    cfg = Config(model=MCFG, decode=DecodeConfig(beam_size=3, maxlen=8))
    params = init_params(jax.random.PRNGKey(0), MCFG)
    cap = Captioner(params, cfg, _vocab())
    rng = np.random.RandomState(0)
    # variable-length per-video features (subsampled/padded to K)
    feats = [rng.randn(10, 32).astype(np.float32),
             rng.randn(3, 32).astype(np.float32)]
    texts = cap.caption(feats)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_caption_chunked_fixed_executable():
    """Requests larger than decode_batch are chunked with padding — one
    compiled shape serves any request size."""
    cfg = Config(model=MCFG, decode=DecodeConfig(beam_size=2, maxlen=8,
                                                 decode_batch=3))
    params = init_params(jax.random.PRNGKey(0), MCFG)
    cap = Captioner(params, cfg, _vocab())
    rng = np.random.RandomState(0)
    texts = cap.caption(rng.randn(7, 6, 32).astype(np.float32))
    assert len(texts) == 7
    # same features -> same captions regardless of position/padding
    same = np.repeat(rng.randn(1, 6, 32).astype(np.float32), 5, axis=0)
    texts2 = cap.caption(same)
    assert len(set(texts2)) == 1


def test_caption_from_run_dir(tmp_path):
    cfg = Config(
        model=MCFG,
        train=TrainConfig(optimizer="adam", lr=1e-3, batch_size=4,
                          maxlen=8, max_epochs=1, valid_freq=0,
                          save_freq=0, disp_freq=100, sample_freq=0,
                          save_dir=str(tmp_path)),
        decode=DecodeConfig(beam_size=1, maxlen=8),
        data=DataConfig(dataset="synthetic", synthetic_videos=4))
    ds = synthetic_dataset(n_videos=4, k=6, d=32, maxlen=8, seed=0)
    with open(tmp_path / "config.json", "w") as f:
        f.write(cfg.to_json())
    ds.vocab.save_pickle(str(tmp_path / "vocab.pkl"))
    fit(cfg, ds, None, max_updates=2)
    cap = Captioner.from_run_dir(str(tmp_path), best=False)
    texts = cap.caption(np.random.RandomState(1).randn(2, 6, 32)
                        .astype(np.float32))
    assert len(texts) == 2
