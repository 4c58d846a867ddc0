"""Trace-profile the beam decode (or train step) on the real chip and
print per-op device time, aggregated by HLO/fusion name.

Usage:
  python tools/profile_decode.py --batch 256 [--kernel] [--train] [--top 30]

Captures a jax.profiler trace (Chrome format works through the axon
relay — verified round 1), parses the .trace.json.gz, and aggregates
device-track event durations.  This is the tool for explaining WHERE a
measured ms/step goes (the round-1 decomposition harness only measured
cumulative prefixes of the step).
"""
import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_decode(batch_size: int, use_kernel: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stvd.config import ModelConfig
    from stvd.decode.beam import beam_decode
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn

    mcfg = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                       n_frames=28, compute_dtype="bfloat16")
    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)  # no EOS
    rng = np.random.RandomState(0)
    batch = {"frames": jnp.asarray(rng.randn(batch_size, 28, 1024),
                                   jnp.float32),
             "frame_mask": jnp.ones((batch_size, 28), jnp.float32)}
    step_fn = get_step_fn(use_kernel)

    @jax.jit
    def run(params, batch):
        return beam_decode(params, mcfg, batch, beam_size=5, maxlen=30,
                           length_norm=0.6, step_fn=step_fn).tokens.sum()

    return run, params, batch


def build_train(batch_size: int, use_kernel: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stvd.config import ModelConfig, TrainConfig
    from stvd.model.kernel import get_step_fn
    from stvd.train.loop import init_train_state, make_train_step

    mcfg = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                       n_frames=28, compute_dtype="bfloat16", scan_unroll=5)
    tcfg = TrainConfig(batch_size=batch_size, maxlen=30)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, step_fn=get_step_fn(use_kernel))
    rng = np.random.RandomState(0)
    batch = {"frames": jnp.asarray(rng.randn(batch_size, 28, 1024),
                                   jnp.float32),
             "frame_mask": jnp.ones((batch_size, 28), jnp.float32),
             "tokens": jnp.asarray(rng.randint(0, 13056, (batch_size, 30)),
                                   jnp.int32),
             "token_mask": jnp.ones((batch_size, 30), jnp.float32),
             "weight": jnp.ones((batch_size,), jnp.float32)}

    holder = {"state": state}

    def run(params_ignored, batch):
        holder["state"], m = step(holder["state"], batch)
        return m["loss"]

    return run, None, batch


def profile(run, params, batch, outdir: str, iters: int = 3):
    import jax
    float(run(params, batch))          # compile+warm outside the trace
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            s = run(params, batch)
        float(s)                        # value-transfer sync INSIDE trace


def parse_trace(outdir: str, top: int, iters: int):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO TRACE FILES under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names like "/device:TPU:0" or containing "TPU"
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3   # us -> ms
        # skip track-spanning container events
        if name.startswith("Steps") or name == "XLA Modules":
            continue
        a = agg.setdefault(name, [0.0, 0])
        a[0] += dur
        a[1] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device tracks: {[pid_name[p] for p in dev_pids]}")
    print(f"total device-event time: {total:.1f} ms over {iters} iters "
          f"(NOTE: includes nested events — use shares, not the sum)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    w = max((len(n) for n, _ in rows), default=10)
    for name, (ms, cnt) in rows:
        print(f"{ms:10.2f} ms  x{cnt:<6d} {ms/iters:9.3f} ms/iter  "
              f"{name[:160]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--kernel", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--outdir", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    outdir = args.outdir or tempfile.mkdtemp(prefix="stvd_prof_")
    build = build_train if args.train else build_decode
    run, params, batch = build(args.batch, args.kernel)
    t0 = time.perf_counter()
    profile(run, params, batch, outdir, args.iters)
    print(f"wall (incl trace overhead): {time.perf_counter()-t0:.2f}s")
    parse_trace(outdir, args.top, args.iters)


if __name__ == "__main__":
    main()
