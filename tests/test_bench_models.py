"""Analytic cost-model sanity (bench.py decode/train models).

These are the models behind the mfu/roofline fields recorded in
BENCH_r*.json — they must track config dims (spatial/motion terms,
round 3) so every preset's "how far from floor?" question is
answerable from the repo (VERDICT round 2, weak #2)."""

import importlib.util
import sys


def _bench():
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_decode_cost_model_spatial_terms():
    bench = _bench()
    from stvd.config import preset
    m3 = preset("3").model
    m2 = preset("2").model
    a = bench.decode_cost_model(m3, 256, 5)
    b = bench.decode_cost_model(m2, 256, 5)
    # spatial adds work on every resource
    assert all(y > x for x, y in zip(a, b))
    # and the addition is dominated by the VPU (the (bt,K,R,s) tanh):
    # preset-2 decode measured vpu-bound (serial ratio 1.10 on v5e)
    assert (b[1] - a[1]) > (b[0] - a[0])


def test_decode_cost_model_motion_dims():
    bench = _bench()
    from stvd.config import preset
    m3 = preset("3").model
    m4 = preset("4").model
    a = bench.decode_cost_model(m3, 256, 5)
    b = bench.decode_cost_model(m4, 256, 5)
    # motion costs nothing per step directly, but ctx 2048 / vocab 20k
    # raise the MXU floor
    assert b[0] > a[0]


def test_train_cost_model_monotone():
    bench = _bench()
    from stvd.config import preset
    m3 = preset("3").model
    m2 = preset("2").model
    m4 = preset("4").model
    f3 = bench.train_cost_model(m3, 64, 30)
    f2 = bench.train_cost_model(m2, 64, 30)
    f4 = bench.train_cost_model(m4, 64, 30)
    assert f2 > f3          # spatial terms (incl. 184-GFLOP pregion GEMM)
    assert f4 > f3          # ctx 2048 + vocab 20k + fusion matmuls
    # the spatial pregion GEMM alone is ~184 GFLOP at reference scale;
    # fwd delta must exceed it (x3 for the train total)
    assert f2 - f3 > 3 * 150e9


def test_roofline_fields_well_formed():
    bench = _bench()
    mfu, bw, vpu, ratio, serial = bench.roofline(1e-3, 2e-3, 0.5e-3, 4e-3)
    assert 0 < mfu < 1 and 0 < bw < 1 and 0 < vpu < 1
    assert serial <= ratio  # serial floor >= max-overlap floor
    assert abs(ratio - 4e-3 / 2e-3) < 1e-9


def test_latency_floor_is_weight_streaming_bound():
    """At b=1 the decode floor flips from MXU to HBM: the ~145 MB
    gates weight stack is streamed every step for 5 rows of work, so
    hbm_s must dominate mxu_s + vpu_s (the premise of bench_latency's
    serial_floor_ms)."""
    bench = _bench()
    mcfg, _, _ = bench._cfgs(False)
    mxu_s, vpu_s, hbm_s = bench.decode_cost_model(mcfg, 1, 5)
    assert hbm_s > mxu_s + vpu_s


def test_bench_latency_smoke():
    """bench_latency end-to-end at toy scale: keys + positive values."""
    bench = _bench()
    out = bench.bench_latency(False, chain_iters=2, synced_iters=2,
                              small=True)
    assert out["metric"] == "decode_latency_ms_b1_beam5"
    assert out["value"] > 0 and out["client_p50_ms"] > 0
    assert out["serial_floor_ms"] > 0


def test_greedy_tail_cost_below_beam():
    """k_sel parametrizes the tail's streaming top-k VPU passes: the
    greedy floor (k_sel=1) must be strictly cheaper on the VPU than the
    beam-5 floor at the same rows, and identical on MXU/HBM."""
    bench = _bench()
    mcfg, _, _ = bench._cfgs(False)
    m5, v5, h5 = bench.decode_cost_model(mcfg, 64, 1, k_sel=5)
    m1, v1, h1 = bench.decode_cost_model(mcfg, 64, 1, k_sel=1)
    assert v1 < v5
    assert m1 == m5 and h1 == h5


def test_bench_decode_trained_bank_dims_guard(tmp_path, capsys):
    """bench_decode_trained must NOT feed a default bank whose dims
    belong to a different config (the repo-root data/msvd bank is
    reference-scale; a small run dir must fall back to synthetic
    features instead of wrong-shaped rows), and the natural-EOS /
    worst-case pair must come out ordered."""
    import numpy as np

    from stvd.cli.train import main as train_main
    from stvd.data.bank import FeatureBank

    d = str(tmp_path / "run")
    rc = train_main([
        "--preset", "msvd-beam",
        "--set", "model.dim=48", "--set", "model.ctx_dim=32",
        "--set", "model.n_frames=5", "--set", "model.n_words=48",
        "--set", "model.dim_word=24",
        "--set", "data.synthetic_videos=6",
        "--set", "train.batch_size=6", "--set", "train.valid_freq=0",
        "--set", "train.sample_freq=0",
        "--set", f"train.save_dir={d}", "--max-updates", "4",
    ])
    assert rc == 0
    bench = _bench()

    # mismatched bank on disk: dims of a DIFFERENT config
    bad = FeatureBank(ids=["v0"], frames=np.zeros((1, 9, 77), "f"),
                      frame_mask=np.ones((1, 9), "f"))
    bad_path = str(tmp_path / "bad_bank.npz")
    bad.save(bad_path)
    out = bench.bench_decode_trained(d, iters=1, batch=4,
                                     bank_path=bad_path)
    assert out["features"] == "synthetic"      # guard engaged
    assert out["value"] > 0
    assert out["captions_per_sec_eos_suppressed"] > 0
    assert 0 < out["mean_caption_len"] <= out["maxlen"]
    assert out["quant"] == "bf16"

    # greedy mode: same harness through greedy_decode (config-1 path)
    g = bench.bench_decode_trained(d, iters=1, batch=4,
                                   bank_path=bad_path, mode="greedy")
    assert g["mode"] == "greedy" and g["beam"] == 1
    assert g["value"] > 0
    assert 0 < g["mean_caption_len"] <= g["maxlen"]
