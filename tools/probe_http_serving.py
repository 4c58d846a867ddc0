"""End-to-end HTTP serving measurement against a running cli/serve
daemon (battery 15).

    python tools/probe_http_serving.py PORT [N_LAT] [BULK]

Reads the artifact manifest from the daemon, fabricates random request
arrays at the manifest's shapes, then measures:
  - b=1 request latency (N_LAT requests; reports min/p50/p95) — the
    client-observed number, i.e. device decode + HTTP + npz overhead;
  - one bulk request at the largest exported batch (or BULK if given):
    client-observed captions/s.

Client-side timing only — this is deliberately the number a serving
user sees, unlike bench.py --what latency which isolates device time.
"""

import json
import sys
import time

import http.client

import numpy as np

sys.path.insert(0, ".")
from stvd.cli.serve import request_captions  # noqa: E402


def _manifest(port):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/manifest")
    man = json.loads(conn.getresponse().read().decode())
    conn.close()
    return man


def _request_arrays(man, batch):
    """Random arrays shaped per the manifest's input spec, with the
    batch dim overridden (shapes are [B, ...] per exported size)."""
    key = str(man["batch_sizes"][0])
    spec = man["inputs"][key]
    rng = np.random.RandomState(0)
    out = {}
    for name in ("frames", "regions", "motion"):
        if name in spec:
            shape = [batch] + [int(d) for d in spec[name][0][1:]]
            out[name] = rng.randn(*shape).astype(np.float32)
    return out


def main():
    port = int(sys.argv[1])
    n_lat = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    man = _manifest(port)
    sizes = man["batch_sizes"]
    bulk = int(sys.argv[3]) if len(sys.argv) > 3 else sizes[-1]
    print(f"manifest: sizes={sizes} beam={man.get('beam_size')} "
          f"dp={man.get('data_parallel', 0)}")

    a1 = _request_arrays(man, 1)
    nbytes = sum(a.nbytes for a in a1.values())
    print(f"b=1 request payload: {nbytes / 1e6:.2f} MB (raw wire)")
    kw1 = dict(regions=a1.get("regions"), motion=a1.get("motion"))
    request_captions("127.0.0.1", port, a1["frames"], **kw1)  # warm
    lat = []
    for _ in range(n_lat):
        t0 = time.perf_counter()
        request_captions("127.0.0.1", port, a1["frames"], **kw1)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    print(f"b=1 client latency over {n_lat}: min {lat[0]:.2f} ms  "
          f"p50 {lat[len(lat) // 2]:.2f} ms  "
          f"p95 {lat[int(len(lat) * 0.95) - 1]:.2f} ms")

    ab = _request_arrays(man, bulk)
    nbytes = sum(a.nbytes for a in ab.values())
    print(f"bulk={bulk} request payload: {nbytes / 1e6:.1f} MB (raw wire)")
    kwb = dict(regions=ab.get("regions"), motion=ab.get("motion"))
    t0 = time.perf_counter()
    caps = request_captions("127.0.0.1", port, ab["frames"], **kwb)
    wall = time.perf_counter() - t0
    print(f"bulk {bulk} captions ({len(caps)} returned): "
          f"{wall * 1e3:.1f} ms client = "
          f"{bulk / wall:.1f} captions/s client-observed")
    print("HTTP_PROBE_DONE")


if __name__ == "__main__":
    main()
