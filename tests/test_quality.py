"""Quality-loop integration: train on structured synthetic data and
score held-out videos with the full decode+metrics pipeline.

This is the closest offline stand-in for the MSVD quality parity target
(BASELINE.md): the valid split uses unseen (subject, verb, scene)
combinations, so a high BLEU requires real feature->word binding and
compositional generalization, not memorization.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stvd.config import Config, DecodeConfig, ModelConfig, TrainConfig
from stvd.data.batching import BatchIterator, gather_batch
from stvd.data.synthetic import structured_splits
from stvd.train.evaluate import evaluate_split
from stvd.train.loop import init_train_state, make_train_step


def test_structured_generalization_scores():
    mcfg = ModelConfig(n_words=64, dim_word=32, dim=96, ctx_dim=96,
                       n_frames=6, compute_dtype="float32",
                       use_dropout=False)
    tcfg = TrainConfig(optimizer="adam", lr=2e-3, batch_size=32,
                       clip_c=5.0, maxlen=12)
    cfg = Config(model=mcfg, train=tcfg,
                 decode=DecodeConfig(beam_size=3, maxlen=12,
                                     length_norm=0.6, decode_batch=16))
    splits = structured_splits(n_train=120, n_valid=16, n_test=16, k=6,
                               d=96, maxlen=12, seed=0)
    assert len(splits["train"].vocab) < mcfg.n_words

    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg)
    dev = splits["train"].bank.to_device()
    it = BatchIterator(splits["train"].captions.n, tcfg.batch_size, seed=0)
    m = {}
    for epoch in range(80):
        for idx, w in it.epoch():
            b = gather_batch(dev, splits["train"].captions, idx)
            b["weight"] = jnp.asarray(w)
            state, m = step(state, b)
        if float(m["nll_per_token"]) < 0.05:
            break
    assert float(m["nll_per_token"]) < 0.5, "training failed to converge"

    scores = evaluate_split(state["params"], cfg, splits["valid"],
                            split="valid")
    # held-out compositional triples: near-perfect captions expected
    assert scores["Bleu_4"] > 0.5, scores
    assert scores["CIDEr"] > 1.0, scores
    assert scores["METEOR"] > 0.5, scores
    assert scores["ROUGE_L"] > 0.7, scores
