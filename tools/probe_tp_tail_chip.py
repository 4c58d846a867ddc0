"""Chip probe: the shard_map Pallas logit-tail island (round-5
decode/parallel._tp_tail_factory) on ONE chip.

The real TP win needs >1 chip (none here: axon exposes a single v5e-1),
but a 1x1 data x model mesh runs the identical shard_map program —
measuring (a) what the island costs vs the plain in-jit Pallas tail and
(b) that the TP decode path with the island does not regress vs its
round-4 all-XLA form, plus token parity of all three.

Usage: python tools/probe_tp_tail_chip.py [iters=8] [batch=384]
"""

import sys
import time

sys.path.insert(0, ".")

from stvd.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stvd.config import DecodeConfig, ModelConfig, TrainConfig  # noqa
from stvd.decode.beam import beam_decode  # noqa: E402
from stvd.decode.parallel import make_tp_beam_decode, \
    shard_decode_params  # noqa: E402
from stvd.model.decoder import init_params  # noqa: E402
from stvd.model.kernel import get_step_fn  # noqa: E402
from stvd.train import parallel  # noqa: E402

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
b = int(sys.argv[2]) if len(sys.argv) > 2 else 384

mcfg = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                   n_frames=28, compute_dtype="bfloat16")
maxlen = 30
rng = np.random.RandomState(0)
batch = {
    "frames": jnp.asarray(rng.randn(b, 28, 1024), jnp.float32),
    "frame_mask": jnp.ones((b, 28), jnp.float32),
}
params = dict(init_params(jax.random.PRNGKey(0), mcfg))
params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)  # worst case


def timed(run, tag):
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run()
    float(s)
    dt = (time.perf_counter() - t0) / iters
    cps = b / dt
    print(f"{tag}: {dt * 1e3:.1f} ms/batch  {cps:.1f} captions/s")
    return cps


# (a) plain single-device decode, Pallas kernels (the headline path)
step_fn = get_step_fn(True)
plain = jax.jit(lambda p, d: beam_decode(
    p, mcfg, d, beam_size=5, maxlen=maxlen, length_norm=0.6,
    step_fn=step_fn).tokens)
tok_a = plain(params, batch)
float(tok_a.sum())
cps_a = timed(lambda: plain(params, batch).sum(), "plain+pallas")

# (b) TP decode over the 1x1 mesh WITH the shard_map tail island
mesh = parallel.make_mesh_2d(jax.devices()[:1], model_parallel=1)
p_sh = shard_decode_params(jax.device_get(params), mesh)
b_sh = parallel.shard_batch(batch, mesh)
run_tp = make_tp_beam_decode(mcfg, mesh, beam_size=5, maxlen=maxlen,
                             length_norm=0.6, tail="tp")
tok_b = run_tp(p_sh, b_sh).tokens
jax.block_until_ready(tok_b)
cps_b = timed(lambda: run_tp(p_sh, b_sh).tokens.sum(), "tp+tail-island")

# (c) TP decode all-XLA (the round-4 behavior)
run_tp0 = make_tp_beam_decode(mcfg, mesh, beam_size=5, maxlen=maxlen,
                              length_norm=0.6, tail="off")
tok_c = run_tp0(p_sh, b_sh).tokens
jax.block_until_ready(tok_c)
cps_c = timed(lambda: run_tp0(p_sh, b_sh).tokens.sum(), "tp+xla-tail")

eq_ab = bool((np.asarray(tok_a) == np.asarray(tok_b)).all())
eq_ac = bool((np.asarray(tok_a) == np.asarray(tok_c)).all())
print(f"token parity plain==island: {eq_ab}  plain==xla-tail: {eq_ac}")
print(f"island vs plain: {cps_b / cps_a - 1:+.1%}   "
      f"island vs xla-tail: {cps_b / cps_c - 1:+.1%}")
