"""Training loss (reference: the cost expression in
``model_attention.py:§build_model`` — masked NLL averaged over the batch,
plus the optional attention-coverage regularizer ``alpha_c``)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..model.decoder import ForwardOut, StepFn, forward_train


def loss_fn(
    params,
    cfg: ModelConfig,
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    train: bool = True,
    ss_prob: float = 0.0,
    step_fn: Optional[StepFn] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Scalar loss + aux dict.

    ``batch['weight']`` (B,), if present, zeroes out wrapped padding
    examples from the static-shape batch iterator.
    """
    out: ForwardOut = forward_train(params, cfg, batch, rng=rng, train=train,
                                    ss_prob=ss_prob, step_fn=step_fn)
    w = batch.get("weight")
    if w is None:
        w = jnp.ones_like(out.nll_per_example)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    nll = jnp.sum(out.nll_per_example * w) / denom
    loss = nll
    if cfg.alpha_c > 0.0:
        # coverage: encourage total attention mass per frame ≈ T_valid/K
        # (show-attend-tell style regularizer the reference inherits)
        tmask = batch["token_mask"]                       # (B, T)
        fmask = batch["frame_mask"]                       # (B, K)
        asum = jnp.sum(out.alphas * tmask[..., None], axis=1)   # (B, K)
        t_valid = jnp.sum(tmask, axis=1, keepdims=True)
        k_valid = jnp.maximum(jnp.sum(fmask, axis=1, keepdims=True), 1.0)
        target = t_valid / k_valid
        reg = jnp.sum(((target - asum) ** 2) * fmask, axis=1)
        loss = loss + cfg.alpha_c * jnp.sum(reg * w) / denom
    # token-level perplexity diagnostics
    n_tok = jnp.maximum(jnp.sum(batch["token_mask"] * w[:, None]), 1.0)
    aux = {
        "nll": nll,
        "nll_per_token": jnp.sum(out.nll_per_example * w) / n_tok,
    }
    return loss, aux
