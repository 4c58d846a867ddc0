"""Measure FeatureBank.to_device upload cost vs the round-3 cache.

The train loop evaluates valid/test every ``valid_freq``: NLL pass +
decode pass each call ``to_device`` (train/loop.py:256, evaluate.py:119),
so before the cache every valid round re-uploaded each split's bank
twice through the host relay.  This probe measures, at real-MSVD
spatial scale (test split: 670 videos, K=28, R=49, Dr=D=1024, bf16
compute), (a) the fresh-upload wall time, (b) the cached-call time,
and derives the per-valid-round saving (2 uploads/split).

Sync discipline (BASELINE.md "measurement-overhead calibration"):
``device_put`` completion is forced by a value transfer off each
uploaded buffer — ``float(...)`` readbacks, never ``block_until_ready``.
If the relay rejects the full-size transfer, the probe retries at
256 videos and reports the measured scale.
"""
import sys, time
sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np

from stvd.data.bank import FeatureBank


def make_bank(n, k=28, r=49, d=1024):
    # Deterministic but cheap to build: broadcast a small random block.
    rng = np.random.RandomState(0)
    frames = np.tile(rng.randn(1, k, d).astype(np.float32), (n, 1, 1))
    regions = np.tile(rng.randn(1, k, r, d).astype(np.float32), (n, 1, 1, 1))
    mask = np.ones((n, k), np.float32)
    ids = [f"vid{i}" for i in range(n)]
    return ids, frames, mask, regions


def sync(dev):
    s = 0.0
    for v in dev.values():
        s += float(v.ravel()[0])
    return s


def main():
    for n in (670, 256):
        ids, frames, mask, regions = make_bank(n)
        nbytes = (frames.size + regions.size) * 2 + mask.size * 4
        print(f"--- n={n}: bank {nbytes / 1e9:.2f} GB as bf16 ---", flush=True)
        try:
            times = []
            for i in range(3):
                bank = FeatureBank(ids=ids, frames=frames, frame_mask=mask,
                                   regions=regions)
                t0 = time.perf_counter()
                dev = bank.to_device(dtype=jnp.bfloat16)
                sync(dev)
                times.append(time.perf_counter() - t0)
                # cached call on the same bank
                t0 = time.perf_counter()
                dev2 = bank.to_device(dtype=jnp.bfloat16)
                sync(dev2)
                cached = time.perf_counter() - t0
                assert dev2 is dev
                print(f"upload[{i}]: {times[-1]:.3f} s   cached: "
                      f"{cached * 1e3:.2f} ms", flush=True)
                del dev, dev2, bank  # free HBM before the next upload
            fresh = min(times)
            print(f"fresh upload (best of 3): {fresh:.3f} s  "
                  f"({nbytes / 1e9 / fresh:.2f} GB/s effective)", flush=True)
            print(f"per-valid-round saving at this scale: "
                  f"{2 * fresh:.2f} s/split (NLL + decode passes)",
                  flush=True)
            break
        except Exception as e:  # relay size limits etc. — try smaller
            print(f"FAILED at n={n}: {type(e).__name__}: {e}", flush=True)
    print("BANK_CACHE_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
