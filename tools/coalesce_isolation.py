"""Isolate the request coalescer's benefit (VERDICT r4 Weak #5).

Round-4 batteries measured the coalescer under 8 client THREADS on this
1-core host and p50 inflated to seconds — a host-contention artifact,
correctly excluded, which left the feature's benefit asserted rather
than measured.  This tool uses the measurement design the verdict asked
for: a single-threaded pipelined burst client.

Per burst: open K connections, WRITE all K b=1 ``/caption_ids``
requests (tiny payloads — they fit in socket buffers, so no reader is
needed for the writes to complete), then read the K responses.  The K
requests are therefore concurrently in flight with near-zero client
CPU:
  * coalesce OFF (single-threaded daemon): K serialized b=1 device
    dispatches per burst;
  * coalesce ON (``--coalesce-wait-ms W``): the daemon's window batches
    the in-flight requests into ~1 padded device dispatch per burst.
Client work is identical in both arms, so the wall-clock ratio isolates
the coalescer; the daemon's own ``/stats coalesce`` block (requests per
dispatch) is recorded as internal corroboration.

The tool manages the daemon lifecycle itself (one TPU process at a
time, sequential arms, signal-free ``/shutdown`` — never SIGKILL a TPU
client on this machine: axon-tunnel wedge).

Usage: python tools/coalesce_isolation.py --artifact ART --bank B.npz
       [--port 8061] [--k 8] [--bursts 100] [--wait-ms 4]
       [--out runs/coalesce_r5.json]
"""

import argparse
import http.client
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def http_json(port, method, path, obj=None, timeout=600):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        body = json.dumps(obj) if obj is not None else None
        conn.request(method, path, body=body,
                     headers={"Content-Type": "application/json"}
                     if body else {})
        r = conn.getresponse()
        return r.status, json.loads(r.read().decode())
    finally:
        conn.close()


def launch_daemon(artifact, bank, port, wait_ms, log_path):
    cmd = [sys.executable, "-m", "stvd.cli.serve", "--artifact", artifact,
           "--bank", bank, "--port", str(port), "--allow-shutdown"]
    if wait_ms > 0:
        cmd += ["--coalesce-wait-ms", str(wait_ms)]
    log = open(log_path, "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
    deadline = time.time() + 900
    while time.time() < deadline:
        try:
            code, h = http_json(port, "GET", "/healthz", timeout=5)
            if code == 200 and h.get("status") == "ok":
                return proc
        except OSError:
            pass
        if proc.poll() is not None:
            raise RuntimeError(f"daemon died; see {log_path}")
        time.sleep(3)
    raise RuntimeError("daemon never became healthy")


def shutdown_daemon(proc, port):
    try:
        http_json(port, "POST", "/shutdown", timeout=30)
    except OSError:
        pass
    try:
        proc.wait(timeout=120)   # clean exit — no signals, ever
    except subprocess.TimeoutExpired:
        pass   # abandoned, NOT killed (machine gotcha)


def run_bursts(port, ids_all, k, bursts, rng):
    """Single thread: write K requests on K sockets, then read all K."""
    per_burst_ms = []
    t_all = time.time()
    for b in range(bursts):
        req_ids = [ids_all[int(j) % len(ids_all)]
                   for j in rng.randint(0, len(ids_all), k)]
        conns = []
        t0 = time.time()
        for rid in req_ids:
            body = json.dumps({"ids": [rid]})
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            c.request("POST", "/caption_ids", body=body,
                      headers={"Content-Type": "application/json"})
            conns.append(c)
        for c in conns:
            r = c.getresponse()
            assert r.status == 200, r.read()[:200]
            r.read()
            c.close()
        per_burst_ms.append((time.time() - t0) * 1e3)
    wall_s = time.time() - t_all
    a = np.array(per_burst_ms)
    return {"bursts": bursts, "k": k, "wall_s": round(wall_s, 2),
            "requests_per_s": round(bursts * k / wall_s, 1),
            "burst_p50_ms": round(float(np.percentile(a, 50)), 2),
            "burst_p95_ms": round(float(np.percentile(a, 95)), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--bank", required=True)
    ap.add_argument("--port", type=int, default=8061)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--bursts", type=int, default=100)
    ap.add_argument("--warm-bursts", type=int, default=5)
    ap.add_argument("--wait-ms", type=float, default=4.0)
    ap.add_argument("--out", default="runs/coalesce_r5.json")
    args = ap.parse_args()

    result = {"k": args.k, "bursts": args.bursts,
              "wait_ms": args.wait_ms, "arms": {}}
    for label, wait in (("off", 0.0), ("on", args.wait_ms)):
        log = f"/tmp/coalesce_daemon_{label}.log"
        proc = launch_daemon(args.artifact, args.bank, args.port, wait, log)
        try:
            code, man = http_json(args.port, "GET", "/manifest")
            assert code == 200, man
            ids_all = man["bank_ids"]
            rng = np.random.RandomState(0)
            run_bursts(args.port, ids_all, args.k, args.warm_bursts, rng)
            arm = run_bursts(args.port, ids_all, args.k, args.bursts, rng)
            code, stats = http_json(args.port, "GET", "/stats")
            arm["coalesce_stats"] = stats.get("coalesce")
            result["arms"][label] = arm
            print(json.dumps({label: arm}), flush=True)
        finally:
            shutdown_daemon(proc, args.port)
        time.sleep(5)

    off, on = result["arms"]["off"], result["arms"]["on"]
    result["speedup"] = round(on["requests_per_s"]
                              / max(off["requests_per_s"], 1e-9), 3)
    co = on.get("coalesce_stats") or {}
    if co.get("dispatches"):
        result["mean_requests_per_dispatch"] = round(
            co.get("requests", 0) / co["dispatches"], 2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"speedup_on_vs_off": result["speedup"],
                      "mean_requests_per_dispatch":
                      result.get("mean_requests_per_dispatch")}))


if __name__ == "__main__":
    main()
