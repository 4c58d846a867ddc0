"""AOT serving-artifact E2E on hardware: export the flagship trained
run, deserialize, and caption — measuring what AOT buys at serving
time (no tracing; StableHLO straight to the compiler) and pinning
artifact-vs-live caption equality at reference scale.

Reports:
  export_s        trace + lower + serialize (the offline cost)
  deserialize_s   artifact -> callable
  first_call_s    first execution (XLA compile of the StableHLO;
                  persistent-cache-warm on repeat runs)
  steady_ms       per-batch decode, pipelined, value-transfer sync
  match           exact caption equality vs the live Captioner

Usage: python tools/probe_aot_artifact.py [RUN_DIR] [BATCH]
One JAX process only (machine rule).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = sys.argv[1] if len(sys.argv) > 1 else "runs/msvd_r2_long"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main():
    import numpy as np

    from stvd.utils import enable_compile_cache
    enable_compile_cache()
    import jax

    from stvd.api import Captioner
    from stvd.export_aot import load_artifact, save_artifact

    platform = jax.default_backend()
    print(f"backend={platform} run={RUN} batch={BATCH}", flush=True)
    cap = Captioner.from_run_dir(RUN)
    import dataclasses
    cap.cfg = dataclasses.replace(
        cap.cfg, decode=dataclasses.replace(cap.cfg.decode,
                                            decode_batch=BATCH))
    m = cap.cfg.model

    out = "/tmp/aot_probe_artifact"
    t0 = time.perf_counter()
    save_artifact(out, cap.params, cap.cfg, cap.vocab,
                  platforms=(platform,), batch_size=BATCH)
    print(f"export_s: {time.perf_counter() - t0:.2f}", flush=True)

    t0 = time.perf_counter()
    served = load_artifact(out)
    print(f"deserialize_s: {time.perf_counter() - t0:.2f}", flush=True)

    rng = np.random.RandomState(0)
    feats = rng.randn(BATCH, m.n_frames, m.ctx_dim).astype(np.float32) * 0.3
    regs = (list(rng.randn(BATCH, m.n_frames, m.n_regions, m.region_dim)
                 .astype(np.float32) * 0.3) if m.use_spatial else None)
    mots = (list(rng.randn(BATCH, m.n_frames, m.motion_dim)
                 .astype(np.float32) * 0.3) if m.use_motion else None)

    t0 = time.perf_counter()
    texts = served.caption(feats, regs, mots)
    print(f"first_call_s: {time.perf_counter() - t0:.2f}", flush=True)

    # steady state: the chunked helper already keeps a window in
    # flight; time several full passes and sync once via the returned
    # host strings (caption() transfers tokens -> real sync)
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        served.caption(feats, regs, mots)
    steady = (time.perf_counter() - t0) / n * 1e3
    print(f"steady_ms_per_batch{BATCH}: {steady:.2f} "
          f"({BATCH / steady * 1e3:.0f} captions/s)", flush=True)

    live = cap.caption(feats, regs, mots)
    match = texts == live
    print(f"match_vs_live: {match} "
          f"({sum(a == b for a, b in zip(texts, live))}/{BATCH})", flush=True)
    print("AOT_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
