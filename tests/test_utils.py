"""Utility-layer tests: mixed-precision cast, step timer, perplexity,
metrics logger."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from stvd.model.decoder import init_params
from stvd.model.step import cast_params
from stvd.train.loop import perplexity
from stvd.utils.logging import MetricsLogger
from stvd.utils.profiling import StepTimer

from conftest import small_cfg


def test_cast_params_policy():
    cfg32 = small_cfg(compute_dtype="float32")
    cfg16 = small_cfg(compute_dtype="bfloat16")
    p = init_params(jax.random.PRNGKey(0), cfg32)
    assert cast_params(p, cfg32) is p  # fp32: no-op, same object
    c = cast_params(p, cfg16)
    assert c["Wemb"].dtype == jnp.bfloat16        # matrices cast
    assert c["b"].dtype == jnp.float32            # biases stay fp32
    assert c["U_att"].dtype == jnp.float32        # vectors stay fp32
    # differentiable back to the fp32 master
    g = jax.grad(lambda pp: cast_params(pp, cfg16)["Wemb"].astype(
        jnp.float32).sum())(p)
    assert g["Wemb"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g["Wemb"]), 1.0)


def test_step_timer_window():
    t = StepTimer(window=3)
    assert t.tick() is None    # initializes
    assert t.tick() is None
    assert t.tick() is None
    rate = t.tick()            # third counted step closes the window
    assert rate is not None and rate > 0


def test_perplexity():
    assert abs(perplexity(0.0) - 1.0) < 1e-9
    assert abs(perplexity(math.log(50.0)) - 50.0) < 1e-6
    assert np.isfinite(perplexity(1e9))  # clamped


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(str(tmp_path), echo=False)
    log.log("train", loss=jnp.float32(1.5), update=3)
    log.close()
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["kind"] == "train" and rec["loss"] == 1.5
    assert "elapsed_s" in rec


def test_metrics_logger_tensorboard(tmp_path):
    """tensorboard=True writes tfevents scalar curves next to the JSONL
    (SURVEY §5 observability: 'optional TensorBoard')."""
    import os

    from stvd.utils.logging import MetricsLogger
    log = MetricsLogger(str(tmp_path), echo=False, tensorboard=True)
    log.log("train", update=1, loss=2.5, grad_norm=0.1)
    log.log("valid", update=1, METEOR=0.3)
    log.close()
    tb = os.path.join(tmp_path, "tb")
    assert any(f.startswith("events.out") for f in os.listdir(tb))
