"""Single-chip A/B of the shard_map Pallas tail island (VERDICT r4
next #2's remaining "Done =" leg: "a single-chip A/B showing no
regression").

Only one real TPU chip exists here, so the TP mesh is 1x1 — that
cannot measure TP *scaling* (the virtual 8-device mesh pins parity;
MULTICHIP dryrun pins compile+execute), but it DOES measure what the
island costs when the shard_map wrapper + axis collectives are in the
graph: all_gather/pmax/psum over a singleton axis must lower to no-ops
for the island to be regression-free at mp=1, and the TP step's jnp
oracle attention vs the plain path's Pallas core is part of the
honest delta.

Variants (reference scale, EOS-suppressed worst case, beam 5, b=384):
  plain      — single-device `beam_decode`, auto kernels (the 4,614
               captions/s headline path)
  tp_island  — `make_tp_beam_decode(tail='tp')` on a 1x1 mesh
               (shard_map Pallas tail island + jnp-oracle step GEMMs)
  tp_off     — `make_tp_beam_decode(tail='off')` (all-XLA TP path)

Measurement per CLAUDE.md: >=8 pipelined invocations per value sync.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from stvd.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

ITERS = 8
B = 384


def main():
    import jax

    from bench import _batch, _cfgs
    from stvd.decode.beam import beam_decode
    from stvd.decode.parallel import make_tp_beam_decode, \
        shard_decode_params
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn
    from stvd.train.parallel import make_mesh_2d, shard_batch

    mcfg, tcfg, dcfg = _cfgs(False)
    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)
    batch = {k: v for k, v in _batch(mcfg, tcfg, B).items()
             if k in ("frames", "frame_mask")}

    out = {"batch": B, "beam": dcfg.beam_size, "iters": ITERS,
           "backend": jax.default_backend()}

    def timed(run, p, bt):
        float(run(p, bt).tokens.sum())        # compile + warmup + sync
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = run(p, bt)
        float(r.tokens.sum())
        return B * ITERS / (time.perf_counter() - t0)

    # plain single-device headline path
    step_fn = get_step_fn(None)
    plain = jax.jit(lambda p, bt: beam_decode(
        p, mcfg, bt, beam_size=dcfg.beam_size, maxlen=dcfg.maxlen,
        length_norm=0.6, step_fn=step_fn))
    out["plain_cps"] = round(timed(plain, params, batch), 2)

    # 1x1 TP mesh: island on / off
    mesh = make_mesh_2d(jax.devices()[:1], model_parallel=1)
    p_tp = shard_decode_params(params, mesh)
    b_tp = shard_batch(batch, mesh)
    for name, tail in (("tp_island", "tp"), ("tp_off", "off")):
        run = make_tp_beam_decode(mcfg, mesh, beam_size=dcfg.beam_size,
                                  maxlen=dcfg.maxlen, length_norm=0.6,
                                  tail=tail)
        out[f"{name}_cps"] = round(timed(run, p_tp, b_tp), 2)

    out["island_vs_off"] = round(
        out["tp_island_cps"] / out["tp_off_cps"], 4)
    out["island_vs_plain"] = round(
        out["tp_island_cps"] / out["plain_cps"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
