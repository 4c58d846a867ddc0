"""Benchmark harness: decode throughput (headline) + train throughput.

Headline metric (BASELINE.json): MSVD decode captions/sec/chip with
batched on-device beam search (beam=5, length norm) at reference scale
(dim~3518->3584 MXU-aligned, ctx 1024, vocab 13056, K=28, maxlen=30).

vs_baseline: the reference decodes ONE video at a time with a
host<->device round-trip per token (SURVEY.md §3.3).  Estimated legacy
throughput (documented in BASELINE.md): beam=5, ~30 steps/video,
>=5 f_next round-trips+top-k per step at ~2-3 ms each on the legacy
stack => ~0.4 s/video => ~2.5 captions/sec.  vs_baseline = ours / 2.5
(the BASELINE north-star target is vs_baseline >= 50x... i.e. >=125).

Usage: python bench.py [--what decode|train|all|quality|dp|latency|serve]
       [--small] [--kernel]
(--what serve: daemon-vs-direct E2E over a real exported artifact —
needs a trained --run-dir; see bench_serve.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

LEGACY_CAPTIONS_PER_SEC = 2.5   # documented estimate, see module docstring
_LAST_TPU_CACHE = "/tmp/stvd_bench_last_tpu.json"
# /tmp is wiped on VM reboot (it happened mid-round-3, losing the cache
# while the tunnel stayed wedged) — a repo-persisted copy survives.
_LAST_TPU_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "runs", "last_tpu_bench.json")

# v5e-1 peaks (public spec): 197 TFLOP/s bf16 / 394 TOPS int8, ~820 GB/s
# HBM.  VPU elementwise rate: 8 sublanes x 128 lanes x ~0.94 GHz ~ 1e12
# f32 ops/s — calibration-free from the spec, and it reproduces the
# measured tail-kernel time within ~10% (BASELINE.md round-2 analysis).
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_INT8 = 394e12
V5E_HBM_BW = 820e9
V5E_VPU_OPS = 1.0e12


def decode_cost_model(mcfg, batch: int, beam: int, quant: str = "none",
                      k_sel: int = 5):
    """Analytic per-while-step resource totals for beam decode.

    Round-2 CORRECTED model.  The round-1 roofline assumed decode is
    weight-bandwidth-bound; per-island profiling on v5e (.scratch and
    BASELINE.md 'Decode roofline, corrected') showed three different
    bounds: the gates matmul is MXU-bound (bf16 1.74 ms measured vs
    1.43 floor; int8 1.03 vs 0.72), the fused logit tail is VPU-bound
    on its streaming top-k passes (0.66 ms vs ~0.58 VPU floor), and
    HBM traffic is minor (~0.15 ms).  Because each step is a serial
    dependency chain (gates -> attention -> logits -> top-k -> beam
    gather), MXU and VPU work cannot overlap; the honest floor is the
    SUM of per-resource times, reported as serial_roofline_ratio next
    to the max-overlap ratio.

    Round-3 extension: spatial (preset 2) terms — the per-step region
    stage is dominated by the (bt, K, R, s) tanh on the VPU and the
    spat @ [W_spat_fuse | w_sf_att] fusion matmuls on the MXU (77+ GFLOP
    per beam step at reference scale: the analytic explanation of why
    preset 2 decodes ~4x slower than preset 3).  Motion (preset 4)
    costs nothing per step — the stream fusion runs once in precompute;
    its dims enter through ctx_dim/n_words.

    Returns (mxu_s, vpu_s, hbm_s) floor seconds per decode step.
    """
    bt = batch * beam
    d, dw, dc, a, v = (mcfg.dim, mcfg.dim_word, mcfg.ctx_dim,
                       mcfg.attn_dim, mcfg.n_words)
    k_f = mcfg.n_frames
    # k_sel: top-k selections the tail kernel streams (5 for beam search,
    # 1 for greedy's argmax)
    gates_flops = 2 * bt * (dw + d + dc) * 4 * d   # [emb|h|ctx] @ [W;U;Wc]
    other_flops = (
        2 * bt * d * (a + 1)              # h @ [Wd_att | W_sel]
        + 4 * bt * k_f * a                # attention scores (tanh+reduce)
        + 2 * bt * k_f * dc               # context reduction
        + 2 * bt * d * dw + 2 * bt * dc * dw  # logit activation matmuls
        + 2 * bt * dw * v                 # vocab matmul (tail kernel)
    )
    gates_peak = V5E_PEAK_INT8 if quant == "int8" else V5E_PEAK_FLOPS
    mxu_s = gates_flops / gates_peak + other_flops / V5E_PEAK_FLOPS

    vp = -(-v // 128) * 128
    vpu_ops = (
        bt * vp * (3 + 4 * k_sel)         # tail: streaming lse (max, exp,
        #                                   acc) + k_sel masked-max
        #                                   selections (~4 passes each)
        + bt * k_f * a * 3                # attention tanh inputs + reduce
        + bt * k_f * 6                    # masked softmax over K
        + 4 * bt * d                      # LSTM gate nonlinearities
    )
    if quant == "int8":
        vpu_ops += bt * (dw + d + dc) * 6  # dynamic activation quant
    wbytes = ((dw + d + dc) * 4 * d * (1 if quant == "int8" else 2)
              + 2 * (d * (a + 1)           # attention projection
                     + dw * (d + dc)       # logit stack
                     + dw * v))            # vocab matrix (read ONCE: the
    #                                        tail kernel's vocab-outer grid)
    abytes = (4 * 4 * bt * d              # h,c carries r/w fp32
              + 2 * 2 * bt * (dw + d + dc)  # x_cat concat r/w bf16
              + 2 * batch * k_f * (a + dc) * 2)  # pctx/ctx attention reads
    if mcfg.use_spatial:
        r, s = mcfg.n_regions, mcfg.region_dim
        mxu_s += (
            2 * bt * k_f * r * s            # spatial score reduce (. u_s)
            + 2 * bt * k_f * r * s          # spat = sum_r alpha_s*regions
            #                                 (region_dim == s here)
            + 2 * bt * k_f * s * (dc + a)   # spat @ [W_spat_fuse|w_sf_att]
        ) / V5E_PEAK_FLOPS
        vpu_ops += (bt * k_f * r * s * 3    # pregion+h add, tanh, scale
                    + bt * k_f * r * 6)     # softmax over R
        abytes += (batch * k_f * r * s * 4  # pregion read (beam-shared,
                   #                          stored f32 by precompute)
                   + batch * k_f * r * s * 2  # regions read (bf16)
                   + 2 * 2 * bt * k_f * (dc + a) * 4)  # per-step ctx_k/
        #                                    pctx_k materialization (f32)
    vpu_s = vpu_ops / V5E_VPU_OPS
    hbm_s = (wbytes + abytes) / V5E_HBM_BW
    return mxu_s, vpu_s, hbm_s


def roofline(mxu_s: float, vpu_s: float, hbm_s: float, step_s: float):
    """Utilizations + two floors: max-overlap (every resource perfectly
    overlapped) and serial (MXU + VPU sum — the honest floor for a
    serially-dependent decode step, HBM overlapped with both)."""
    mfu = mxu_s / step_s                 # fraction of step at MXU peak
    bw = hbm_s / step_s
    vpu = vpu_s / step_s
    floor = max(mxu_s, vpu_s, hbm_s)
    serial = max(mxu_s + vpu_s, hbm_s)
    return (round(mfu, 4), round(bw, 4), round(vpu, 4),
            round(step_s / floor, 2), round(step_s / serial, 2))


def _cfgs(small: bool):
    from stvd.config import ModelConfig, TrainConfig, DecodeConfig
    if small:
        m = ModelConfig(n_words=1024, dim_word=128, dim=256, ctx_dim=256,
                        n_frames=8, compute_dtype="bfloat16")
        t = TrainConfig(batch_size=16, maxlen=16)
        d = DecodeConfig(beam_size=5, maxlen=16, decode_batch=16)
    else:
        # reference scale, MXU-aligned (dim 3518 -> 3584, vocab -> 13056)
        m = ModelConfig(n_words=13056, dim_word=512, dim=3584, ctx_dim=1024,
                        n_frames=28, compute_dtype="bfloat16",
                        scan_unroll=1)  # fused seq-VJP: unroll=1 fastest
        t = TrainConfig(batch_size=64, maxlen=30)
        d = DecodeConfig(beam_size=5, maxlen=30, decode_batch=64)
    return m, t, d


def _batch(mcfg, tcfg, b, seed=0):
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.RandomState(seed)
    out = {
        "frames": jnp.asarray(rng.randn(b, mcfg.n_frames, mcfg.ctx_dim),
                              jnp.float32),
        "frame_mask": jnp.ones((b, mcfg.n_frames), jnp.float32),
        "tokens": jnp.asarray(
            rng.randint(0, mcfg.n_words, (b, tcfg.maxlen)), jnp.int32),
        "token_mask": jnp.ones((b, tcfg.maxlen), jnp.float32),
    }
    if mcfg.use_spatial:
        out["regions"] = jnp.asarray(
            rng.randn(b, mcfg.n_frames, mcfg.n_regions, mcfg.region_dim)
            .astype(np.float32) * 0.1)
    if mcfg.use_motion:
        out["motion"] = jnp.asarray(
            rng.randn(b, mcfg.n_frames, mcfg.motion_dim), jnp.float32)
    return out


def bench_decode(small: bool, use_kernel: bool, iters: int = 8,
                 batch: int = 0, quant: str = "none",
                 gates_kernel: str = "off", beam_gather: str = "config",
                 beam_buf: str = "config"):
    import dataclasses

    import jax
    from stvd.decode.beam import beam_decode
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn

    mcfg, tcfg, dcfg = _cfgs(small)
    if quant != "none":
        mcfg = dataclasses.replace(mcfg, decode_quant=quant)
    if gates_kernel != "off":
        mcfg = dataclasses.replace(mcfg, gates_kernel=gates_kernel)
    if beam_gather != "config":
        mcfg = dataclasses.replace(mcfg, beam_gather=beam_gather)
    if beam_buf != "config":
        mcfg = dataclasses.replace(mcfg, beam_buf=beam_buf)
    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    # random weights emit EOS immediately and the early-exit while_loop
    # finishes in ~1 step (3.6M "captions"/s of empty strings). Suppress
    # EOS so every sequence runs the full maxlen steps — the honest
    # WORST case; trained models finish earlier and decode faster.
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)
    b = batch or dcfg.decode_batch
    batch = {k: v for k, v in _batch(mcfg, tcfg, b).items()
             if k in ("frames", "frame_mask")}
    step_fn = get_step_fn(use_kernel)

    @jax.jit
    def run(params, batch):
        # scalar output: value transfer is the only reliable completion
        # sync through this machine's axon relay (block_until_ready
        # returns before remote execution finishes)
        return beam_decode(params, mcfg, batch, beam_size=dcfg.beam_size,
                           maxlen=dcfg.maxlen, length_norm=0.6,
                           step_fn=step_fn).tokens.sum()

    float(run(params, batch))                # compile + warmup + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(params, batch)               # dispatches pipeline
    float(s)                                 # one full sync at the end
    dt = time.perf_counter() - t0
    cps = b * iters / dt
    return cps, dt / iters


def bench_decode_trained(run_dir: str, iters: int = 8, batch: int = 0,
                         bank_path: str = "", quant: str = "",
                         mode: str = "beam"):
    """Realistic-length decode headline (VERDICT r4 next #3): a TRAINED
    checkpoint decoding with natural EOS, so the early-exit while_loop
    actually exits at real caption lengths (the machinery built for
    exactly this) — reported NEXT TO the EOS-suppressed all-maxlen-steps
    worst case on the same weights, plus the measured mean caption
    length.  The reference's throughput is defined by actual caption
    lengths (``model_attention.py:§gen_sample``), so the honest headline
    pair is (worst case, trained-early-exit).

    Inputs: rows from the run's feature bank when available (cycled to
    fill the batch), else synthetic features — a trained model still
    emits natural-length captions either way (mean length is reported
    so the reader can judge).

    ``mode='greedy'`` measures the config-1 greedy path instead of
    beam-5 (default batch moves to the measured greedy sweet spot,
    b=1024 — battery r5i).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stvd.api import Captioner
    from stvd.data.bank import FeatureBank
    from stvd.decode.beam import beam_decode
    from stvd.decode.greedy import greedy_decode

    cap = Captioner.from_run_dir(run_dir, quant=quant or None)
    mcfg, dcfg = cap.cfg.model, cap.cfg.decode
    b = batch or (1024 if mode == "greedy" else 384)
    keys = ["frames", "frame_mask"]
    if mcfg.use_spatial:
        keys.append("regions")
    if mcfg.use_motion:
        keys.append("motion")

    bank_path = bank_path or "data/msvd/bank.npz"
    bank = FeatureBank.load(bank_path) if os.path.exists(bank_path) \
        else None
    if bank is not None and (
            bank.frames.shape[1] != mcfg.n_frames
            or bank.frames.shape[2] != mcfg.ctx_dim
            or ("regions" in keys and (
                bank.regions is None
                or bank.regions.shape[2:] != (mcfg.n_regions,
                                              mcfg.region_dim)))
            or ("motion" in keys and (
                bank.motion is None
                or bank.motion.shape[2] != mcfg.motion_dim))):
        # the default bank may belong to a DIFFERENT config than the
        # run dir (dims/streams mismatch) — fall back to synthetic
        # rather than feeding wrong-shaped features
        bank = None
    if bank is not None:
        dev = bank.to_device(dtype=jnp.dtype(mcfg.compute_dtype))
        n = dev["frames"].shape[0]
        rows = jnp.asarray(np.arange(b) % n, jnp.int32)
        dec = {k: dev[k][rows] for k in keys}
        src = f"bank:{bank_path}"
    else:
        mc, tc, _ = _cfgs(False)
        dec = {k: v for k, v in _batch(mcfg, tc, b).items() if k in keys}
        src = "synthetic"

    def timed(params):
        @jax.jit
        def run(params, dec):
            if mode == "greedy":
                out = greedy_decode(params, mcfg, dec,
                                    maxlen=dcfg.maxlen,
                                    step_fn=cap.step_fn)
            else:
                out = beam_decode(params, mcfg, dec,
                                  beam_size=dcfg.beam_size,
                                  maxlen=dcfg.maxlen,
                                  length_norm=dcfg.length_norm,
                                  step_fn=cap.step_fn)
            return out.tokens.sum(), out.lengths

        _, lengths = run(params, dec)
        float(_)                              # compile + warmup + sync
        mean_len = float(jnp.mean(lengths.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            s, _l = run(params, dec)
        float(s)
        dt = time.perf_counter() - t0
        return b * iters / dt, mean_len

    cps_nat, mean_len = timed(cap.params)
    worst = dict(cap.params)
    worst["ff_logit_b"] = worst["ff_logit_b"].at[0].set(-1e9)
    cps_worst, _ = timed(worst)
    return {
        "metric": "decode_captions_per_sec_trained",
        "value": round(cps_nat, 2), "unit": "captions/s",
        "vs_baseline": round(cps_nat / LEGACY_CAPTIONS_PER_SEC, 1),
        "mode": mode,
        "beam": dcfg.beam_size if mode == "beam" else 1, "batch": b,
        "mean_caption_len": round(mean_len, 2),
        "maxlen": dcfg.maxlen,
        "captions_per_sec_eos_suppressed": round(cps_worst, 2),
        "early_exit_speedup": round(cps_nat / cps_worst, 2),
        "quant": quant or "bf16",
        "run_dir": run_dir, "features": src,
    }


def bench_greedy(use_kernel: bool, iters: int = 16, batch: int = 1024,
                 quant: str = "none"):
    """Config-1 (greedy) decode throughput at reference scale."""
    import dataclasses

    import jax
    from stvd.decode.greedy import greedy_decode
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn

    mcfg, tcfg, dcfg = _cfgs(False)
    if quant != "none":
        mcfg = dataclasses.replace(mcfg, decode_quant=quant)
    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)
    b = {k: v for k, v in _batch(mcfg, tcfg, batch).items()
         if k in ("frames", "frame_mask")}
    step_fn = get_step_fn(use_kernel)

    @jax.jit
    def run(params, b):
        return greedy_decode(params, mcfg, b, maxlen=dcfg.maxlen,
                             step_fn=step_fn).tokens.sum()

    float(run(params, b))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(params, b)
    float(s)
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters


def bench_latency(use_kernel: bool, quant: str = "none",
                  chain_iters: int = 32, synced_iters: int = 12,
                  small: bool = False):
    """Single-request serving latency: batch=1, beam-5, full-maxlen decode.

    The throughput benches answer "captions/s at saturation"; serving
    also cares about the b=1 critical path, which at this scale is
    weight-STREAMING-bound (the ~145 MB gates stack is read every step
    for 5 rows of work).  Two numbers, per BASELINE.md's
    measurement-overhead calibration:

    * ``device_ms`` — a SERIAL CHAIN of ``chain_iters`` decodes (each
      consumes the previous result, so nothing overlaps or hoists) with
      one value sync at the end: per-decode device latency with the
      relay RTT amortized away.
    * ``client_p50_ms`` — one value-synced call per measurement: what a
      caller observes through this machine's axon relay (~3-30 ms RTT
      included; reported as-is, NOT RTT-corrected).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from stvd.decode.beam import beam_decode
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn

    mcfg, tcfg, dcfg = _cfgs(small)
    if quant != "none":
        mcfg = dataclasses.replace(mcfg, decode_quant=quant)
    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)
    b = {k: v for k, v in _batch(mcfg, tcfg, 1).items()
         if k in ("frames", "frame_mask")}
    step_fn = get_step_fn(use_kernel)

    @jax.jit
    def run(params, frames, fmask, eps):
        bb = {"frames": frames * (1.0 + eps), "frame_mask": fmask}
        out = beam_decode(params, mcfg, bb, beam_size=dcfg.beam_size,
                          maxlen=dcfg.maxlen, length_norm=0.6,
                          step_fn=step_fn)
        # tiny scalar: serial-dependency feedback for the chained
        # variant AND the value-transfer sync for the synced one
        return out.tokens.sum().astype(jnp.float32) * 1e-30

    eps = jnp.float32(0.0)
    float(run(params, b["frames"], b["frame_mask"], eps))   # compile+warm
    t0 = time.perf_counter()
    s = eps
    for _ in range(chain_iters):
        s = run(params, b["frames"], b["frame_mask"], s)
    float(s)
    device_ms = (time.perf_counter() - t0) / chain_iters * 1e3

    synced = []
    for _ in range(synced_iters):
        t0 = time.perf_counter()
        float(run(params, b["frames"], b["frame_mask"], eps))
        synced.append((time.perf_counter() - t0) * 1e3)
    synced.sort()
    p50 = synced[len(synced) // 2]

    mxu_s, vpu_s, hbm_s = decode_cost_model(mcfg, 1, dcfg.beam_size, quant)
    floor_ms = max(mxu_s + vpu_s, hbm_s) * dcfg.maxlen * 1e3
    return {"metric": "decode_latency_ms_b1_beam5",
            "value": round(device_ms, 3), "unit": "ms",
            "vs_baseline": None,
            "client_p50_ms": round(p50, 2),
            "client_min_ms": round(min(synced), 2),
            "serial_floor_ms": round(floor_ms, 2),
            "serial_roofline_ratio": round(device_ms / floor_ms, 2),
            "quant": quant, "maxlen": dcfg.maxlen}


def train_cost_model(mcfg, batch: int, maxlen: int) -> float:
    """Forward-pass matmul FLOPs of one train step; backward ~2x
    forward (the standard 3x total used for train MFU).

    Spatial (preset 2): adds the per-step region stage (score reduce,
    spat weighted sum, the two fusion matmuls) plus the once-per-step
    pregion precompute (regions @ Ws_att — 184 GFLOP at reference
    scale) and its backward dWs_att GEMM.  Motion (preset 4): the
    once-per-step stream fusion matmuls."""
    b, t = batch, maxlen
    d, dw, dc, a, v = (mcfg.dim, mcfg.dim_word, mcfg.ctx_dim,
                       mcfg.attn_dim, mcfg.n_words)
    k_f = mcfg.n_frames
    fwd = (
        2 * b * t * (dw + d + dc) * 4 * d   # gates over the scan
        + 2 * b * t * d * (a + 1)           # h attention projection
        + 4 * b * t * k_f * a               # attention scores
        + 2 * b * t * k_f * dc              # context reduction
        + 2 * b * t * dw * (d + dc)         # logit activation matmuls
        + 2 * b * t * dw * v                # vocab matmul (post-scan)
        + 2 * b * k_f * dc * a              # pctx precompute
    )
    if mcfg.use_spatial:
        r, s = mcfg.n_regions, mcfg.region_dim
        fwd += (
            2 * b * t * d * s               # h @ Wsd_att (spatial h proj)
            + 2 * b * t * k_f * r * s       # spatial score reduce
            + 2 * b * t * k_f * r * s       # spat weighted sum (Dr == s)
            + 2 * b * t * k_f * s * (dc + a)  # spat @ [W_spat_fuse|w_sfa]
            + 2 * b * k_f * r * s * s       # pregion = regions @ Ws_att
            #                                 (once per step, not per t)
        )
    if mcfg.use_motion:
        dm = mcfg.motion_dim
        fwd += 2 * b * k_f * (dc * dc + dm * dc)  # stream fusion (once)
    return 3.0 * fwd


def bench_train(small: bool, use_kernel: bool, iters: int = 10,
                batch: int = 0):
    import dataclasses

    import jax
    from stvd.model.kernel import get_step_fn
    from stvd.train.loop import init_train_state, make_train_step

    mcfg, tcfg, _ = _cfgs(small)
    if batch:
        tcfg = dataclasses.replace(tcfg, batch_size=batch)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, step_fn=get_step_fn(use_kernel))
    batch = _batch(mcfg, tcfg, tcfg.batch_size)
    batch["weight"] = batch["token_mask"][:, 0]
    state, m = step(state, batch)
    float(m["loss"])                          # compile + warmup + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])                          # full completion sync
    dt = time.perf_counter() - t0
    return iters / dt, dt / iters


def bench_preset(name: str, use_kernel: bool, iters: int = 4):
    """Benchmark one of the five BASELINE presets at its own (reference-
    scale) config — `preset(N)` now IS the BASELINE shape (config.py).

    Presets 1-4 measure decode throughput (greedy for 1, beam-5 for
    2/3/4 incl. spatial regions / motion stream); preset 5 measures the
    explicit-shard-map DP train step over all local devices.
    """
    import jax
    from stvd.config import preset
    from stvd.decode.beam import beam_decode
    from stvd.decode.greedy import greedy_decode
    from stvd.model.decoder import init_params
    from stvd.model.kernel import get_step_fn

    cfg = preset(name)
    mcfg, dcfg, tcfg = cfg.model, cfg.decode, cfg.train
    step_fn = get_step_fn(use_kernel)

    if cfg.train.use_shard_map:  # preset 5: DP training
        from stvd.train import parallel
        from stvd.train.loop import init_train_state, make_train_step
        import dataclasses
        mesh = parallel.make_mesh()
        n_dev = mesh.devices.size
        b = (tcfg.per_device_batch or tcfg.batch_size) * n_dev
        tcfg = dataclasses.replace(tcfg, batch_size=b)
        state = parallel.replicate(
            init_train_state(jax.random.PRNGKey(0), mcfg, tcfg), mesh)
        step = make_train_step(mcfg, tcfg, step_fn=step_fn, mesh=mesh,
                               use_shard_map=True)
        batch = _batch(mcfg, tcfg, b)
        batch["weight"] = batch["token_mask"][:, 0]
        batch = parallel.shard_batch(batch, mesh)
        state, m = step(state, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = time.perf_counter() - t0
        return {"metric": f"preset{name}_dp_train_steps_per_sec",
                "value": round(iters / dt, 3), "unit": "steps/s",
                "vs_baseline": None, "devices": n_dev, "global_batch": b,
                "examples_per_sec": round(iters / dt * b, 1),
                "path": "shard_map+psum"}

    params = dict(init_params(jax.random.PRNGKey(0), mcfg))
    params["ff_logit_b"] = params["ff_logit_b"].at[0].set(-1e9)  # worst case
    b = dcfg.decode_batch
    batch = {k: v for k, v in _batch(mcfg, tcfg, b).items()
             if k in ("frames", "frame_mask", "regions", "motion")}

    @jax.jit
    def run(params, batch):
        if dcfg.beam_size == 1:
            return greedy_decode(params, mcfg, batch, maxlen=dcfg.maxlen,
                                 step_fn=step_fn).tokens.sum()
        return beam_decode(params, mcfg, batch, beam_size=dcfg.beam_size,
                           maxlen=dcfg.maxlen, length_norm=dcfg.length_norm,
                           step_fn=step_fn).tokens.sum()

    float(run(params, batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run(params, batch)
    float(s)
    dt = time.perf_counter() - t0
    cps = b * iters / dt
    out = {"metric": f"preset{name}_decode_captions_per_sec",
           "value": round(cps, 2), "unit": "captions/s",
           "vs_baseline": round(cps / LEGACY_CAPTIONS_PER_SEC, 1),
           "beam": dcfg.beam_size, "batch": b,
           "spatial": mcfg.use_spatial, "motion": mcfg.use_motion}
    # roofline fields per preset (round-3: presets 2/4 get the same
    # cost-model rigor as the headline — spatial/motion terms included)
    step_s = (dt / iters) / dcfg.maxlen
    mxu_s, vpu_s, hbm_s = decode_cost_model(mcfg, b, dcfg.beam_size,
                                            quant=mcfg.decode_quant)
    mfu, bwu, vpu, ratio, serial = roofline(mxu_s, vpu_s, hbm_s, step_s)
    out.update(mfu=mfu, hbm_bw_util=bwu, vpu_util=vpu,
               roofline_ratio=ratio, serial_roofline_ratio=serial)
    return out


def bench_preset_train(name: str, use_kernel: bool, iters: int = 10,
                       fused: bool = True, batch: int = 0,
                       spatial_bwd: str = "auto",
                       opt_slots: str = "float32",
                       fwd_kernel: str = "auto",
                       tail_kernel: str = "auto",
                       grad_accum: int = 1):
    """Teacher-forced train-step throughput at a preset's reference
    scale (presets 1-4; preset 5 is the DP path in bench_preset).

    ``fused=False`` measures the autodiff(+remat for spatial) fallback
    — the before/after evidence for the hand-derived sequence VJPs.
    """
    import dataclasses

    import jax
    from stvd.config import preset
    from stvd.model.kernel import get_step_fn
    from stvd.train.loop import init_train_state, make_train_step

    cfg = preset(name)
    mcfg, tcfg = cfg.model, cfg.train
    if batch:
        tcfg = dataclasses.replace(tcfg, batch_size=batch)
    if spatial_bwd != "auto":
        mcfg = dataclasses.replace(mcfg, spatial_bwd_kernel=spatial_bwd)
    if fwd_kernel != "auto":
        mcfg = dataclasses.replace(mcfg, train_fwd_kernel=fwd_kernel)
    if tail_kernel != "auto":
        mcfg = dataclasses.replace(mcfg, train_tail_kernel=tail_kernel)
    if opt_slots != "float32":
        tcfg = dataclasses.replace(tcfg, opt_slot_dtype=opt_slots)
    if grad_accum > 1:
        # microbatched grads (train.grad_accum): measures the serial
        # latency the memory saving costs vs remat's recompute
        tcfg = dataclasses.replace(tcfg, grad_accum=grad_accum)
    if not fused:
        # the autodiff path needs remat at full spatial scale (the
        # saved (B,K,R,s) tanh activations exceed HBM otherwise)
        mcfg = dataclasses.replace(mcfg, fused_seq_grad=False,
                                   remat=mcfg.use_spatial)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, step_fn=get_step_fn(use_kernel))
    batch = _batch(mcfg, tcfg, tcfg.batch_size)
    batch["weight"] = batch["token_mask"][:, 0]
    state, m = step(state, batch)
    float(m["loss"])                          # compile + warmup + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])                          # full completion sync
    dt = time.perf_counter() - t0
    sps = iters / dt
    mfu = train_cost_model(mcfg, tcfg.batch_size, tcfg.maxlen) \
        / (V5E_PEAK_FLOPS * dt / iters)
    return {"metric": f"preset{name}_train_steps_per_sec",
            "value": round(sps, 3), "unit": "steps/s",
            "vs_baseline": None, "batch": tcfg.batch_size,
            "step_ms": round(dt / iters * 1e3, 2),
            "examples_per_sec": round(sps * tcfg.batch_size, 1),
            "train_mfu": round(mfu, 4),
            "spatial": mcfg.use_spatial, "motion": mcfg.use_motion,
            "path": ("fused_seq_vjp" if fused else
                     "autodiff" + ("+remat" if mcfg.remat else "")),
            "spatial_bwd_kernel": mcfg.spatial_bwd_kernel,
            "train_fwd_kernel": mcfg.train_fwd_kernel,
            "train_tail_kernel": mcfg.train_tail_kernel,
            "opt_slot_dtype": tcfg.opt_slot_dtype,
            "grad_accum": tcfg.grad_accum}


_ABANDONED_PROBES: list = []


def probe_device(timeout_s: int = 150) -> bool:
    """Run a trivial computation in a subprocess with a soft deadline.

    A KILLED TPU client (SIGKILL, or SIGTERM mid-compile) wedges this
    machine's axon tunnel for 30-60+ minutes — and round 5 caught the
    probe itself causing exactly that: subprocess.run(timeout=...)
    SIGKILLs the child, so every timed-out probe EXTENDED the wedge it
    was measuring, and retries could never succeed.  This version
    NEVER kills: on deadline it abandons the child (parked in
    _ABANDONED_PROBES; it exits cleanly on its own whenever the tunnel
    recovers) and reports unhealthy.  Later probes first reap
    abandoned children — a clean exit 0 from one of them is itself
    proof of recovery.
    """
    import subprocess
    import tempfile
    for p in list(_ABANDONED_PROBES):
        rc = p.poll()
        if rc is not None:
            _ABANDONED_PROBES.remove(p)
            if rc == 0:
                return True      # an earlier probe finished fine
    # reuse the compile cache: a cold compile of even this trivial
    # program occasionally exceeds the deadline through the relay
    # (round 3: two battery jobs lost to probe false negatives)
    cache = os.environ.get("STVD_CACHE_DIR", "/tmp/jax_cache")
    code = ("import jax, jax.numpy as jnp;"
            + (f"jax.config.update('jax_compilation_cache_dir',{cache!r});"
               "jax.config.update("
               "'jax_persistent_cache_min_compile_time_secs',0.0);"
               if cache else "")
            + "print(float(jax.jit(lambda x: x.sum())(jnp.ones((8,)))))")
    out = tempfile.TemporaryFile()
    p = subprocess.Popen([sys.executable, "-c", code], stdout=out,
                         stderr=subprocess.STDOUT)
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        rc = p.poll()
        if rc is not None:
            return rc == 0
        time.sleep(2)
    _ABANDONED_PROBES.append(p)   # never kill a TPU client
    return False


def _probe_with_retries(attempts: int = 8, backoff_s: int = 60) -> bool:
    """The axon tunnel wedges transiently (minutes-scale) on this
    machine; retry the health probe before falling back to the CPU
    lower bound so a flaky window doesn't cost the round its real
    TPU measurement.

    Round-4 post-mortem: the driver's snapshot run fell back after 3
    tries x 45 s while the wedge lasted ~40 min, so the official
    scoreboard carried a CPU number.  Backoff now grows 1x,2x,3x,...
    (~30 min total patience at the defaults, capped by
    STVD_PROBE_BUDGET_S) — cheap relative to losing the round's
    scoreboard entry, and a healthy tunnel still passes on try 1."""
    budget = float(os.environ.get("STVD_PROBE_BUDGET_S", 1800))
    t0 = time.time()
    for attempt in range(attempts):
        if probe_device():
            return True
        wait = backoff_s * (attempt + 1)
        if attempt == attempts - 1 or time.time() + wait - t0 > budget:
            break
        time.sleep(wait)
    return False


def bench_quality(use_kernel: bool, hard: bool = False):
    """Train the structured-synthetic quality recipe to convergence and
    score held-out videos (BLEU-4/METEOR/CIDEr) — the offline stand-in
    for MSVD quality parity (no real feature banks on this machine)."""
    import jax
    import jax.numpy as jnp
    from stvd.config import Config, DecodeConfig, ModelConfig, TrainConfig
    from stvd.data.batching import BatchIterator, gather_batch
    from stvd.data.synthetic import structured_splits
    from stvd.model.kernel import get_step_fn
    from stvd.train.evaluate import evaluate_split
    from stvd.train.loop import init_train_state, make_train_step

    mcfg = ModelConfig(n_words=64, dim_word=48, dim=128, ctx_dim=128,
                       n_frames=8, compute_dtype="float32",
                       use_dropout=True, dropout_rate=0.3)
    maxlen = 14 if hard else 12
    tcfg = TrainConfig(optimizer="adam", lr=2e-3, batch_size=32,
                       clip_c=5.0, maxlen=maxlen)
    cfg = Config(model=mcfg, train=tcfg,
                 decode=DecodeConfig(beam_size=5, maxlen=maxlen,
                                     length_norm=0.6, decode_batch=32))
    splits = structured_splits(n_train=200, n_valid=32, n_test=32, k=8,
                               d=128, maxlen=maxlen, hard=hard)
    step_fn = get_step_fn(use_kernel)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, step_fn=step_fn)
    dev = splits["train"].bank.to_device()
    it = BatchIterator(splits["train"].captions.n, tcfg.batch_size, seed=0)
    m = {}
    for epoch in range(120):
        for idx, w in it.epoch():
            b = gather_batch(dev, splits["train"].captions, idx)
            b["weight"] = jnp.asarray(w)
            state, m = step(state, b)
        if float(m["nll_per_token"]) < (0.3 if hard else 0.05):
            break
    return evaluate_split(state["params"], cfg, splits["test"],
                          split="test", step_fn=step_fn)


def bench_dp(small: bool, use_kernel: bool, iters: int = 10):
    """Data-parallel train throughput over ALL local devices (config 5).

    On a single chip this measures the DP=1 code path; on a v5e-4 slice
    the same invocation measures 4-way ICI scaling.
    """
    import jax
    from stvd.model.kernel import get_step_fn
    from stvd.train import parallel
    from stvd.train.loop import init_train_state, make_train_step

    mesh = parallel.make_mesh()
    n_dev = mesh.devices.size
    mcfg, tcfg, _ = _cfgs(small)
    state = init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    state = parallel.replicate(state, mesh)
    step = make_train_step(mcfg, tcfg, step_fn=get_step_fn(use_kernel),
                           mesh=mesh)
    b = tcfg.batch_size * n_dev
    batch = _batch(mcfg, tcfg, b)
    batch["weight"] = batch["token_mask"][:, 0]
    batch = parallel.shard_batch(batch, mesh)
    state, m = step(state, batch)
    float(m["loss"])                          # compile + warmup + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])                          # full completion sync
    dt = time.perf_counter() - t0
    return iters / dt, n_dev, b


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _serve_direct_code(art: str, sizes, n_lat: int, bank: str = "") -> str:
    """Child-process script: load the artifact IN-PROCESS and time
    caption() per batch size — the no-HTTP baseline the daemon numbers
    are compared against.  With ``bank``, also time caption_ids (the
    fused gather+decode path) at b=1 and a bulk burst: the no-HTTP ids
    ceiling that separates HTTP cost from dispatch cost in the
    bank-resident daemon numbers."""
    return f"""
import json, time, sys
import numpy as np
sys.path.insert(0, ".")
from stvd.utils import enable_compile_cache
enable_compile_cache()
from stvd.export_aot import load_artifact
cap = load_artifact({art!r})
m = cap.cfg.model
rng = np.random.RandomState(0)
def arrs(b):
    out = {{"features":
            (rng.randn(b, m.n_frames, m.ctx_dim) * 0.3).astype("float32")}}
    if m.use_spatial:
        out["regions"] = (rng.randn(b, m.n_frames, m.n_regions,
                                    m.region_dim) * 0.3).astype("float32")
    if m.use_motion:
        out["motion"] = (rng.randn(b, m.n_frames,
                                   m.motion_dim) * 0.3).astype("float32")
    return out
res = {{}}
for b in {list(sizes)!r}:
    a = arrs(b)
    kw = dict(regions=a.get("regions"), motion=a.get("motion"))
    cap.caption(a["features"], **kw)          # warm (StableHLO compile)
    reps = {n_lat} if b == 1 else 6
    lat = []
    t0 = time.perf_counter()
    for _ in range(reps):
        t1 = time.perf_counter()
        cap.caption(a["features"], **kw)      # strings out = real sync
        lat.append((time.perf_counter() - t1) * 1e3)
    wall = time.perf_counter() - t0
    lat.sort()
    res[str(b)] = {{
        "min_ms": round(lat[0], 2),
        "p50_ms": round(lat[len(lat) // 2], 2),
        "p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)], 2),
        "captions_per_sec": round(b * reps / wall, 1)}}
print("DIRECT_JSON:" + json.dumps(res))
if {bank!r}:
    from stvd.data.bank import FeatureBank
    cap.attach_bank(FeatureBank.load({bank!r}))
    ids = cap.bank_ids
    bulk = max({list(sizes)!r})
    burst = [ids[i % len(ids)] for i in range(bulk)]
    cap.caption_ids(ids[:1]); cap.caption_ids(burst)   # warm both buckets
    lat = []
    for _ in range({n_lat}):
        t1 = time.perf_counter()
        cap.caption_ids(ids[:1])
        lat.append((time.perf_counter() - t1) * 1e3)
    lat.sort()
    t0 = time.perf_counter()
    cap.caption_ids(burst)
    wall = time.perf_counter() - t0
    print("DIRECT_IDS_JSON:" + json.dumps({{
        "b1_p50_ms": round(lat[len(lat) // 2], 2),
        "bulk": bulk,
        "bulk_captions_per_sec": round(bulk / wall, 1)}}))
"""


def _daemon_measure(port: int, sizes, n_lat: int, mcfg_like=None,
                    concurrency: int = 0):
    """Drive a running cli/serve daemon over HTTP (raw wire) and return
    per-size client latency/throughput.  With ``concurrency`` > 0, run
    that many b=1 client threads against the coalescer instead."""
    import http.client
    import threading

    import numpy as np

    from stvd.cli.serve import request_captions

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("GET", "/manifest")
    man = json.loads(conn.getresponse().read().decode())
    conn.close()
    spec = man["inputs"][str(man["batch_sizes"][0])]
    rng = np.random.RandomState(0)

    def arrs(b):
        out = {}
        for name in ("frames", "regions", "motion"):
            if name in spec:
                shape = [b] + [int(d) for d in spec[name][0][1:]]
                out[name] = (rng.randn(*shape) * 0.3).astype(np.float32)
        return out

    if concurrency > 0:
        a1 = arrs(1)
        kw = dict(regions=a1.get("regions"), motion=a1.get("motion"))
        request_captions("127.0.0.1", port, a1["frames"], **kw)  # warm
        per_thread = max(4, n_lat // concurrency)
        lat_all, lock = [], threading.Lock()

        def client():
            mine = []
            for _ in range(per_thread):
                t0 = time.perf_counter()
                request_captions("127.0.0.1", port, a1["frames"], **kw)
                mine.append((time.perf_counter() - t0) * 1e3)
            with lock:
                lat_all.extend(mine)

        threads = [threading.Thread(target=client)
                   for _ in range(concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat_all.sort()
        n = len(lat_all)
        return {"clients": concurrency, "requests": n,
                "p50_ms": round(lat_all[n // 2], 2),
                "p95_ms": round(lat_all[max(0, int(n * 0.95) - 1)], 2),
                "captions_per_sec": round(n / wall, 1)}

    res = {}
    for b in sizes:
        a = arrs(b)
        kw = dict(regions=a.get("regions"), motion=a.get("motion"))
        request_captions("127.0.0.1", port, a["frames"], **kw)   # warm
        reps = n_lat if b == 1 else 6
        lat = []
        t0 = time.perf_counter()
        for _ in range(reps):
            t1 = time.perf_counter()
            request_captions("127.0.0.1", port, a["frames"], **kw)
            lat.append((time.perf_counter() - t1) * 1e3)
        wall = time.perf_counter() - t0
        lat.sort()
        res[str(b)] = {
            "min_ms": round(lat[0], 2),
            "p50_ms": round(lat[len(lat) // 2], 2),
            "p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)], 2),
            "captions_per_sec": round(b * reps / wall, 1)}
    return res


def _daemon_shutdown(port: int, proc) -> None:
    """Stop the daemon via POST /shutdown — NEVER signals: a SIGKILLed
    (or mid-compile SIGTERMed) TPU client wedges the axon tunnel for
    hours (machine rule)."""
    import http.client
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/shutdown")
        conn.getresponse().read()
        conn.close()
    except OSError:
        pass
    try:
        proc.wait(timeout=60)
    except Exception:
        pass   # leave it be — do not signal a TPU client


def _ids_measure(port: int, n_lat: int, bulk: int):
    """Drive POST /caption_ids against a --bank daemon: b=1 latency and
    a bulk burst over the resident ids (cycled if the bank is smaller
    than the burst)."""
    import http.client

    from stvd.cli.serve import request_caption_ids

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("GET", "/manifest")
    man = json.loads(conn.getresponse().read().decode())
    conn.close()
    ids = man.get("bank_ids") or []
    if not ids:
        return {"error": "daemon has no resident bank"}
    request_caption_ids("127.0.0.1", port, ids[:1])          # warm b=1
    lat = []
    for _ in range(n_lat):
        t0 = time.perf_counter()
        request_caption_ids("127.0.0.1", port, ids[:1])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    burst = [ids[i % len(ids)] for i in range(bulk)]
    # warm the bulk bucket too: its graph's first call pays the AOT
    # load/warmup, not serving cost (battery r4e measured the cold
    # first bulk at 5.4 s vs sub-second steady)
    t0 = time.perf_counter()
    request_caption_ids("127.0.0.1", port, burst)
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    caps = request_caption_ids("127.0.0.1", port, burst)
    wall = time.perf_counter() - t0
    return {"bank_videos": man.get("bank_videos"),
            "bulk_first_call_s": round(cold_s, 2),
            "b1_p50_ms": round(lat[len(lat) // 2], 2),
            "b1_p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)], 2),
            "bulk": bulk,
            "bulk_captions_per_sec": round(len(caps) / wall, 1),
            "request_bytes_per_video": "~16 (an id string)"}


def bench_serve(run_dir: str, platform: str, sizes=(1, 32, 256),
                n_lat: int = 30, coalesce_ms: float = 4.0,
                bank: str = "", quant: str = ""):
    """Serving E2E benchmark (``--what serve``): export a REAL artifact
    from ``run_dir``, then measure (a) direct in-process artifact
    captions/s + latency, (b) the HTTP daemon end-to-end over the raw
    wire format, (c) the request coalescer under concurrent b=1
    clients, on and off.  This is battery 15's repeatable form — the
    number a serving user sees, not a stub-captioner overhead table.

    Machine rules by construction: every JAX phase (export, direct
    timing, each daemon) is its OWN child process run strictly one at a
    time (one CPU core, one chip); the parent never initializes JAX;
    daemons exit via POST /shutdown, never signals."""
    import subprocess

    art = "/tmp/stvd_bench_serve_art"
    out = {"metric": "serve_captions_per_sec",
           "unit": "captions/s", "vs_baseline": None,
           "run_dir": run_dir, "platform": platform,
           "batch_sizes": list(sizes), "wire": "raw",
           "quant": quant or "config"}

    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "stvd.cli.export", "--run-dir", run_dir,
         "--out", art, "--platforms", platform,
         "--batch", ",".join(str(s) for s in sizes)]
        + (["--quant", quant] if quant else []),
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"export failed:\n{r.stdout}\n{r.stderr}")
    out["export_s"] = round(time.perf_counter() - t0, 1)

    r = subprocess.run(
        [sys.executable, "-c", _serve_direct_code(art, sizes, n_lat,
                                                  bank=bank)],
        capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("DIRECT_JSON:"):
            out["direct"] = json.loads(line[len("DIRECT_JSON:"):])
        elif line.startswith("DIRECT_IDS_JSON:"):
            out["direct_ids"] = json.loads(
                line[len("DIRECT_IDS_JSON:"):])
    if "direct" not in out:
        raise RuntimeError(f"direct probe failed:\n{r.stdout}\n{r.stderr}")

    def start_daemon(extra):
        port = _free_port()
        log = open(f"/tmp/stvd_bench_serve_daemon_{port}.log", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "stvd.cli.serve", "--artifact", art,
             "--port", str(port), "--allow-shutdown"] + extra,
            stdout=log, stderr=subprocess.STDOUT)
        import http.client
        # 1500 s: warmup of three deserialized graphs through the relay
        # measured 784 s (battery r4c) — the old 600 s deadline gave up
        # while the daemon was still warming, ORPHANING a TPU-holding
        # process that wedged everything after it
        deadline = time.time() + 1500
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"daemon exited early; see {log.name}")
            try:
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=5)
                conn.request("GET", "/healthz")
                conn.getresponse().read()
                conn.close()
                return port, proc
            except OSError:
                time.sleep(1.0)
        # best-effort cleanup — NEVER signal a TPU client; if it is
        # still warming the shutdown lands once it starts serving
        _daemon_shutdown(port, proc)
        raise RuntimeError(
            f"daemon never became healthy in 1500s; see {log.name}. "
            f"If a 'python -m stvd.cli.serve' process lingers, stop it "
            f"with: curl -X POST localhost:{port}/shutdown")

    port, proc = start_daemon([])
    try:
        out["daemon"] = _daemon_measure(port, sizes, n_lat)
    finally:
        _daemon_shutdown(port, proc)

    port, proc = start_daemon(
        ["--coalesce-wait-ms", str(coalesce_ms)])
    try:
        out["coalesce"] = _daemon_measure(port, sizes, n_lat,
                                          concurrency=8)
        out["coalesce"]["wait_ms"] = coalesce_ms
    finally:
        _daemon_shutdown(port, proc)

    if bank:
        # bank-resident phase: requests carry video ids, zero feature
        # payload — isolates decode from the wire/transfer bandwidth
        # that bounds the feature-payload numbers above (BASELINE.md
        # round-4 bandwidth table)
        port, proc = start_daemon(["--bank", bank])
        try:
            out["bank_resident"] = _ids_measure(port, n_lat,
                                                bulk=sizes[-1])
        finally:
            _daemon_shutdown(port, proc)

    bulk = str(sizes[-1])
    out["value"] = out["daemon"][bulk]["captions_per_sec"]
    out["daemon_overhead_b1_ms"] = round(
        out["daemon"]["1"]["p50_ms"] - out["direct"]["1"]["p50_ms"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="decode",
                    choices=["decode", "train", "all", "quality", "dp",
                             "latency", "serve"])
    ap.add_argument("--run-dir", default="runs/msvd_r4_flagship",
                    help="--what serve: trained run dir to export the "
                         "served artifact from")
    ap.add_argument("--coalesce-ms", type=float, default=4.0,
                    help="--what serve: coalescer collection window")
    ap.add_argument("--serve-bank", default="",
                    help="--what serve: packed bank .npz for the "
                         "bank-resident (id-addressed) phase")
    ap.add_argument("--serve-quant", default="", choices=["", "int8"],
                    help="--what serve: bake decode_quant into the "
                         "exported artifact (W8A8 serving)")
    ap.add_argument("--trained", default="",
                    help="--what decode: run dir with a TRAINED "
                         "checkpoint — report the realistic-length "
                         "natural-EOS headline next to the "
                         "EOS-suppressed worst case (same weights)")
    ap.add_argument("--trained-quant", default="", choices=["", "int8"],
                    help="--trained: decode_quant override (the W8A8 "
                         "serving path under natural-EOS early exit)")
    ap.add_argument("--trained-bank", default="",
                    help="--trained: packed bank .npz for real input "
                         "features (default data/msvd/bank.npz if "
                         "present, else synthetic)")
    ap.add_argument("--trained-mode", default="beam",
                    choices=["beam", "greedy"],
                    help="--trained: decode mode (greedy = the config-1 "
                         "path at its b=1024 sweet spot)")
    ap.add_argument("--no-trained", action="store_true",
                    help="headline run: skip the trained natural-EOS "
                         "rider (it engages only when the committed "
                         "flagship run dir + bank are present)")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--kernel", action="store_true", default=None,
                    help="force the Pallas fused kernels (default: auto "
                         "— the production selection: kernels on TPU)")
    ap.add_argument("--no-kernel", dest="kernel", action="store_false",
                    help="force the XLA step path")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the batch size (preset train bench)")
    ap.add_argument("--hard", action="store_true",
                    help="quality: harder non-saturating synthetic recipe")
    ap.add_argument("--preset", default=None,
                    help="benchmark a BASELINE preset (1-5 or its name) "
                         "at reference scale; decode by default, "
                         "combine with --what train for the train step")
    ap.add_argument("--no-fused", dest="fused", action="store_false",
                    default=True,
                    help="with --what train --preset: measure the "
                         "autodiff(+remat) fallback instead of the "
                         "fused sequence VJP")
    ap.add_argument("--spatial-bwd", default="auto",
                    choices=["auto", "on", "off"],
                    help="with --what train --preset 2: toggle the "
                         "fused Pallas backward-spatial kernel "
                         "(before/after evidence)")
    ap.add_argument("--opt-slots", default="float32",
                    choices=["float32", "bfloat16"],
                    help="with --what train --preset: adadelta "
                         "accumulator storage dtype (bf16 halves the "
                         "optimizer island's HBM traffic)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="train.grad_accum microbatches for --what "
                         "train presets")
    ap.add_argument("--tail-kernel", default="auto",
                    choices=["auto", "on", "off"],
                    help="with --what train --preset: toggle the fused "
                         "Pallas train-scan tail (model.train_tail_"
                         "kernel) for before/after evidence")
    ap.add_argument("--gates-kernel", default="off",
                    choices=["off", "on", "auto"],
                    help="with --what decode: toggle the fused Pallas "
                         "gates+LSTM kernel (model.gates_kernel) for "
                         "before/after evidence")
    ap.add_argument("--beam-gather", default="config",
                    choices=["config", "take", "flat", "onehot"],
                    help="with --what decode: override the beam parent-"
                         "state reorder lowering (model.beam_gather; "
                         "'config' = the ModelConfig default, flat "
                         "since battery r4g measured it +9.2%% beam-5)")
    ap.add_argument("--beam-buf", default="config",
                    choices=["config", "reorder", "backptr"],
                    help="with --what decode: override the beam token "
                         "bookkeeping scheme (model.beam_buf) for the "
                         "battery-r4h A/B")
    ap.add_argument("--pin-repo-cache", action="store_true",
                    help="also write the TPU headline record to the "
                         "committed runs/last_tpu_bench.json (the "
                         "reboot-proof wedge-fallback copy); without "
                         "this flag only /tmp is updated, so routine "
                         "runs never dirty the working tree")
    ap.add_argument("--fwd-kernel", default="auto",
                    choices=["auto", "on", "off"],
                    help="with --what train --preset: toggle the Pallas "
                         "attention core inside the fused-VJP forward "
                         "scan (before/after evidence)")
    args = ap.parse_args()

    if args.what == "serve":
        # orchestrator only — the parent must stay JAX-free (export,
        # direct timing and the daemons are child processes; one CPU
        # core, one chip, strictly one JAX process at a time)
        if args.cpu or os.environ.get("STVD_FORCE_CPU"):
            plat = "cpu"
        else:
            plat = "tpu" if (args.no_probe or _probe_with_retries()) \
                else "cpu"
        sizes = (1, 8) if args.small else (1, 32, 256)
        print(json.dumps(bench_serve(args.run_dir, plat, sizes=sizes,
                                     coalesce_ms=args.coalesce_ms,
                                     bank=args.serve_bank,
                                     quant=args.serve_quant)))
        return

    # persistent compile cache: repeated bench invocations (driver runs,
    # kernel/batch variants) reuse executables instead of recompiling;
    # shared location + STVD_CACHE_DIR override with the CLI/tests
    from stvd.utils import enable_compile_cache
    enable_compile_cache()

    if args.cpu or os.environ.get("STVD_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.what == "dp" or args.preset in ("5", "msvd-dp"):
            jax.config.update("jax_num_cpu_devices", 8)  # simulate a slice
    elif not args.no_probe and not _probe_with_retries():
        # TPU tunnel wedged (known failure mode on this machine when a
        # TPU client is SIGKILLed): measure on CPU rather than hang,
        # and say so — the number is a severe LOWER bound for the chip.
        import jax
        jax.config.update("jax_platforms", "cpu")
        cps, per_batch = bench_decode(True, args.kernel, max(2, args.iters // 2))
        rec = {
            "metric": "decode_captions_per_sec_per_chip",
            "value": round(cps, 2), "unit": "captions/s",
            "vs_baseline": round(cps / LEGACY_CAPTIONS_PER_SEC, 1),
            "platform": "cpu-fallback (1 core)",
            "error": "TPU tunnel unresponsive; CPU lower bound reported",
            "beam": 5, "batch_decode_ms": round(per_batch * 1e3, 1)}
        for cache in (_LAST_TPU_CACHE, _LAST_TPU_REPO):
            try:
                with open(cache) as f:
                    # last known-good chip record from a previous run of
                    # this same script on this machine — informational
                    # only, clearly labeled; the headline stays the
                    # honestly-measured CPU lower bound
                    rec["last_tpu_measurement"] = json.load(f)
                break
            except (OSError, ValueError):
                pass
        print(json.dumps(rec))
        return

    if args.trained:
        print(json.dumps(bench_decode_trained(
            args.trained, args.iters, batch=args.batch,
            bank_path=args.trained_bank, quant=args.trained_quant,
            mode=args.trained_mode)))
        return
    if args.preset:
        if args.what == "train" and args.preset not in ("5", "msvd-dp"):
            print(json.dumps(bench_preset_train(args.preset, args.kernel,
                                                args.iters,
                                                fused=args.fused,
                                                batch=args.batch,
                                                spatial_bwd=args.spatial_bwd,
                                                opt_slots=args.opt_slots,
                                                fwd_kernel=args.fwd_kernel,
                                                tail_kernel=args.tail_kernel,
                                                grad_accum=args.grad_accum)))
        else:
            print(json.dumps(bench_preset(args.preset, args.kernel,
                                          args.iters)))
        return
    if args.what == "dp":
        sps, n_dev, b = bench_dp(args.small, args.kernel, args.iters)
        print(json.dumps({
            "metric": "dp_train_steps_per_sec", "value": round(sps, 3),
            "unit": "steps/s", "vs_baseline": None, "devices": n_dev,
            "global_batch": b,
            "examples_per_sec": round(sps * b, 1)}))
        return
    if args.what == "latency":
        out = bench_latency(args.kernel, small=args.small,
                            chain_iters=min(32, max(4, args.iters * 4)))
        if not args.small:   # int8 companion row (serving path)
            out["int8"] = {k: v for k, v in
                           bench_latency(args.kernel, quant="int8").items()
                           if k in ("value", "client_p50_ms",
                                    "serial_roofline_ratio")}
        print(json.dumps(out))
        return
    if args.what == "quality":
        scores = bench_quality(args.kernel, args.hard)
        print(json.dumps({
            "metric": "synthetic_heldout_bleu4", "value": scores["Bleu_4"],
            "unit": "bleu", "vs_baseline": None,
            **{k: round(v, 4) for k, v in scores.items()}}))
        return

    extras = {}
    if args.what in ("train", "all"):
        sps, spt = bench_train(args.small, args.kernel)
        mcfg, tcfg, _ = _cfgs(args.small)
        extras["train_steps_per_sec"] = round(sps, 3)
        extras["train_step_ms"] = round(spt * 1e3, 2)
        extras["train_examples_per_sec"] = round(sps * tcfg.batch_size, 1)
        extras["train_mfu"] = round(
            train_cost_model(mcfg, tcfg.batch_size, tcfg.maxlen)
            / (V5E_PEAK_FLOPS * spt), 4)
        if not args.small:
            # train is weight-bandwidth-bound per step: larger batches
            # raise examples/s nearly linearly until compute-bound
            sps256, _ = bench_train(False, args.kernel,
                                    max(2, args.iters // 2), batch=256)
            extras["train_examples_per_sec_batch256"] = round(
                sps256 * 256, 1)
        if args.what == "train":
            print(json.dumps({
                "metric": "train_steps_per_sec", "value": round(sps, 3),
                "unit": "steps/s", "vs_baseline": None, **extras}))
            return
    cps, per_batch = bench_decode(args.small, args.kernel, args.iters,
                                  gates_kernel=args.gates_kernel,
                                  beam_gather=args.beam_gather,
                                  beam_buf=args.beam_buf)
    out = {
        "metric": "decode_captions_per_sec_per_chip",
        "value": round(cps, 2),
        "unit": "captions/s",
        "vs_baseline": round(cps / LEGACY_CAPTIONS_PER_SEC, 1),
        "beam": 5,
        "batch_decode_ms": round(per_batch * 1e3, 1),
        **extras,
    }
    if not args.small:
        mcfg, tcfg, dcfg = _cfgs(False)
        best_b = dcfg.decode_batch
        # larger batch amortizes weight reads until VMEM spill; v5e
        # sweet spot measured at 384 (round 2), 256 kept for history
        for b in (256, 384):
            cps_b, pb = bench_decode(False, args.kernel, args.iters,
                                     batch=b,
                                     gates_kernel=args.gates_kernel,
                                     beam_gather=args.beam_gather,
                                     beam_buf=args.beam_buf)
            out[f"captions_per_sec_batch{b}"] = round(cps_b, 2)
            if cps_b > out["value"]:
                out["value"] = round(cps_b, 2)
                out["batch"] = b
                per_batch = pb
                best_b = b
        import jax as _j
        auto_kernel = (args.kernel if args.kernel is not None
                       else _j.default_backend() == "tpu")
        if not auto_kernel:
            # the fused Pallas kernels (attention core + logit tail)
            # are the production step — report the better as headline
            cps_k, pb = bench_decode(False, True, args.iters, batch=384)
            out["captions_per_sec_kernel"] = round(cps_k, 2)
            if cps_k > out["value"]:
                out["value"] = round(cps_k, 2)
                out["kernel"] = True
                out["batch"] = 384
                per_batch = pb
                best_b = 384
        # refresh the per-batch display for the configuration the
        # headline value actually came from (it was set pre-sweep)
        out["batch_decode_ms"] = round(per_batch * 1e3, 1)
        # corrected cost model (round 2): per-resource utilizations and
        # distance from the max-overlap and serial-chain roofline floors
        step_s = per_batch / dcfg.maxlen
        mxu_s, vpu_s, hbm_s = decode_cost_model(mcfg, best_b,
                                                dcfg.beam_size)
        mfu, bwu, vpu, ratio, serial = roofline(mxu_s, vpu_s, hbm_s,
                                                step_s)
        out["mfu"] = mfu
        out["hbm_bw_util"] = bwu
        out["vpu_util"] = vpu
        out["roofline_ratio"] = ratio
        out["serial_roofline_ratio"] = serial
        # config-1 greedy headline rides along — always the production
        # path (fused Pallas tail top-1), independent of --kernel
        g_cps, g_pb = bench_greedy(True, iters=16, batch=1024)
        out["greedy_captions_per_sec"] = round(g_cps, 2)
        # greedy floor: beam=1, single masked-max tail pass (k_sel=1)
        mxu_g, vpu_g, hbm_g = decode_cost_model(mcfg, 1024, 1, k_sel=1)
        _, _, _, r_g, s_g = roofline(mxu_g, vpu_g, hbm_g,
                                     g_pb / dcfg.maxlen)
        out["greedy_roofline_ratio"] = r_g
        out["greedy_serial_roofline_ratio"] = s_g
        # opt-in W8A8 serving path (model.decode_quant='int8'): the
        # gates matmul — the compute-bound majority of the beam step —
        # runs on the v5e int8 MXU at ~2x the bf16 rate.  Reported as a
        # separate field, not the headline: it is a quality tradeoff
        # (greedy token agreement >=90% pinned in tests/test_decode.py).
        q_cps, q_pb = bench_decode(False, True, args.iters,
                                   batch=448, quant="int8",
                                   gates_kernel=args.gates_kernel,
                                   beam_gather=args.beam_gather,
                                   beam_buf=args.beam_buf)
        out["captions_per_sec_int8"] = round(q_cps, 2)
        # int8 sweet spot is 448, not bf16's 384 (battery r4j sweep:
        # 448 +1.5% over 384; 512+ spills for both dtypes)
        mxu_q, vpu_q, hbm_q = decode_cost_model(mcfg, 448, dcfg.beam_size,
                                                quant="int8")
        _, _, _, r_q, s_q = roofline(mxu_q, vpu_q, hbm_q,
                                     q_pb / dcfg.maxlen)
        out["roofline_ratio_int8"] = r_q
        out["serial_roofline_ratio_int8"] = s_q
        gq_cps, _ = bench_greedy(True, iters=16, batch=1024,
                                 quant="int8")
        out["greedy_captions_per_sec_int8"] = round(gq_cps, 2)
        # trained natural-EOS records ride along when the committed
        # flagship checkpoint + bank are present (VERDICT r4 weak #1:
        # the official scoreboard must carry the claimed records — the
        # realistic-length headline included, not just the worst case).
        # Guarded: any failure is recorded, never fatal to the headline.
        tdir, tbank = "runs/msvd_r4_temporal", "data/msvd/bank.npz"
        if not args.no_trained and not args.small \
                and os.path.isdir(tdir) and os.path.exists(tbank):
            try:
                tr = bench_decode_trained(tdir, args.iters,
                                          bank_path=tbank)
                ti = bench_decode_trained(tdir, args.iters,
                                          bank_path=tbank, quant="int8")
                out["trained_captions_per_sec"] = tr["value"]
                out["trained_captions_per_sec_int8"] = ti["value"]
                out["trained_mean_caption_len"] = tr["mean_caption_len"]
                out["trained_early_exit_speedup"] = tr[
                    "early_exit_speedup"]
                out["trained_run_dir"] = tdir
            except Exception as e:          # pragma: no cover - guard
                out["trained_error"] = f"{type(e).__name__}: {e}"
        out["vs_baseline"] = round(out["value"] / LEGACY_CAPTIONS_PER_SEC, 1)
        import jax as _jx
        if _jx.default_backend() == "tpu":
            # cache the record so a wedged-tunnel fallback run can
            # report the last known-good chip measurement (labeled);
            # /tmp always, the repo copy (reboot-proof) only on
            # --pin-repo-cache so routine runs don't dirty the tree
            caches = [_LAST_TPU_CACHE] + (
                [_LAST_TPU_REPO] if args.pin_repo_cache else [])
            for cache in caches:
                try:
                    with open(cache, "w") as f:
                        json.dump(out, f)
                except OSError:
                    pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
