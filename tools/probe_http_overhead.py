"""Serving-layer overhead, isolated from the model: time the HTTP
daemon's request path (npz decode + routing + JSON reply on localhost)
with a stub captioner that returns instantly.

The client-observed serving latency decomposes as
    device decode + relay RTT + THIS (HTTP + npz + dispatch plumbing);
this probe pins the third term at reference-scale request sizes so the
battery-15 chip numbers can be attributed.  Pure CPU — runs during
tunnel wedges.

    python tools/probe_http_overhead.py [N_REQ]
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")
from stvd.cli.serve import CaptionServer, request_captions  # noqa: E402


class _StubCaptioner:
    """Instant-return captioner: isolates the serving layer."""

    def caption(self, features, regions=None, motion=None):
        return ["a"] * int(np.asarray(features).shape[0])


def _measure(label, feats, regs, n_req, port_server):
    nbytes = feats.nbytes + (regs.nbytes if regs is not None else 0)
    for wire in ("npz", "raw"):
        lat = []
        for _ in range(n_req):
            t0 = time.perf_counter()
            request_captions("127.0.0.1", port_server.server_port, feats,
                             regions=regs, wire=wire)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        print(f"{label} [{wire}]: {nbytes / 1e6:.2f} MB payload | "
              f"round-trip min {lat[0]:.2f} ms  "
              f"p50 {lat[len(lat) // 2]:.2f} ms  "
              f"p95 {lat[int(len(lat) * 0.95) - 1]:.2f} ms")


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    srv = CaptionServer(_StubCaptioner(), port=0, mode="stub")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    rng = np.random.RandomState(0)

    # reference temporal scale: K=28, D=1024
    f1 = rng.randn(1, 28, 1024).astype(np.float32)
    _measure("b=1 temporal (28x1024)", f1, None, n_req, srv)

    # reference spatial scale adds the region bank: R=49, Dr=1024
    r1 = rng.randn(1, 28, 49, 1024).astype(np.float32)
    _measure("b=1 spatial (+28x49x1024)", f1, r1, n_req, srv)

    f32b = rng.randn(32, 28, 1024).astype(np.float32)
    r32b = rng.randn(32, 28, 49, 1024).astype(np.float32)
    _measure("b=32 spatial bulk", f32b, r32b, max(5, n_req // 6), srv)

    srv.shutdown()
    srv.server_close()
    print("HTTP_OVERHEAD_DONE")


if __name__ == "__main__":
    main()
