"""Serving soak battery (VERDICT r4 next #8): a sustained request run
against the HTTP daemon, tracking memory and latency drift.

Phases (defaults sized for ~10k total requests):
  1. ids b=1 sustained    — the production id-addressed path, bulk of
                            the soak; windowed p50/p95 to expose drift
  2. ids bulk-32 bursts   — interleaved every 50th request
  3. raw-wire b=1 subset  — the feature-payload path (500 requests)
  4. mid-run weight swap  — POST /swap_params at the halfway mark; the
                            soak must continue cleanly on new weights
  5. cold-bucket hit      — one request at a batch size whose graph has
                            not been touched yet, latency recorded
                            separately (AOT bucket routing)

Tracks daemon RSS via /proc/<pid>/status every window.  Emits JSON
lines per window and a final summary with drift and memory verdicts.

Usage: python tools/soak_serving.py --port P --pid DAEMON_PID
       [--ids-total 9000] [--wire-total 500] [--swap path.npz]
       [--cold-n 7] [--out runs/soak_r5.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def get_rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def http_json(port, method, path, obj=None, timeout=600):
    import http.client
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--ids-total", type=int, default=9000)
    ap.add_argument("--wire-total", type=int, default=500)
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--swap", default="",
                    help="params .npz for the mid-run swap phase")
    ap.add_argument("--cold-n", type=int, default=7,
                    help="batch size for the cold-bucket hit (must not "
                         "be used elsewhere in the soak)")
    ap.add_argument("--out", default="runs/soak_r5.json")
    args = ap.parse_args()

    code, man = http_json(args.port, "GET", "/manifest")
    assert code == 200, man
    code, h = http_json(args.port, "GET", "/healthz")
    assert code == 200 and h["status"] == "ok"
    ids_all = None
    code, ids_resp = http_json(args.port, "GET", "/stats")
    # fetch the resident ids via a tiny probe request error (no ids
    # listing endpoint) — take them from the manifest if present
    n_bank = int(man.get("bank_videos") or 0)
    assert n_bank > 0, "soak needs a daemon started with --bank"
    # ids are vid0000.. style from make_synthetic_corpus / pack_bank
    # order; discover by probing /caption_ids with a guess, else fall
    # back to the manifest-provided list
    ids_all = man.get("bank_ids")
    if not ids_all:
        for pat in ("vid%04d", "train%04d", "v%d"):
            probe = [pat % 0]
            code, r = http_json(args.port, "POST", "/caption_ids",
                                {"ids": probe})
            if code == 200:
                ids_all = [pat % i for i in range(n_bank)]
                break
    assert ids_all, "could not discover bank ids; add bank_ids to manifest"

    rng = np.random.RandomState(0)
    windows = []
    lat = []
    swap_at = args.ids_total // 2
    events = {"swap": None, "cold": None, "errors": 0}
    rss0 = get_rss_mb(args.pid)
    t_start = time.time()

    for i in range(args.ids_total):
        if args.swap and i == swap_at:
            t0 = time.time()
            code, r = http_json(args.port, "POST", "/swap_params",
                                {"path": args.swap})
            events["swap"] = {"i": i, "code": code,
                              "ms": round((time.time() - t0) * 1e3, 1)}
            assert code == 200, r
        if i == int(args.ids_total * 0.75):
            cold_ids = [ids_all[int(j) % len(ids_all)]
                        for j in rng.randint(0, len(ids_all),
                                             args.cold_n)]
            t0 = time.time()
            code, r = http_json(args.port, "POST", "/caption_ids",
                                {"ids": cold_ids})
            events["cold"] = {"i": i, "n": args.cold_n, "code": code,
                              "ms": round((time.time() - t0) * 1e3, 1)}
        bulk = (i % 50 == 49)
        n = 32 if bulk else 1
        req = [ids_all[int(j) % len(ids_all)]
               for j in rng.randint(0, len(ids_all), n)]
        t0 = time.time()
        code, r = http_json(args.port, "POST", "/caption_ids",
                            {"ids": req})
        ms = (time.time() - t0) * 1e3
        if code != 200:
            events["errors"] += 1
        if not bulk:
            lat.append(ms)
        if len(lat) >= args.window:
            w = np.array(lat)
            lat = []
            windows.append({
                "through_i": i, "p50_ms": round(float(
                    np.percentile(w, 50)), 2),
                "p95_ms": round(float(np.percentile(w, 95)), 2),
                "rss_mb": round(get_rss_mb(args.pid), 1)})
            print(json.dumps(windows[-1]), flush=True)

    # feature-payload (npz wire) subset — inline client, NO stvd/jax
    # import (this process must never touch the TPU tunnel the daemon
    # holds)
    wire = []
    if args.wire_total:
        import http.client
        import io
        m = man
        K = int(m.get("n_frames") or 28)
        D = int(m.get("ctx_dim") or 1024)
        feats = (rng.randn(1, K, D) * 0.3).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, features=feats)
        body = buf.getvalue()
        for i in range(args.wire_total):
            t0 = time.time()
            conn = http.client.HTTPConnection("127.0.0.1", args.port,
                                              timeout=600)
            try:
                conn.request("POST", "/caption", body=body, headers={
                    "Content-Type": "application/x-npz"})
                r = conn.getresponse()
                assert r.status == 200, r.read()[:200]
                r.read()
            finally:
                conn.close()
            wire.append((time.time() - t0) * 1e3)
        wire = {"n": args.wire_total,
                "p50_ms": round(float(np.percentile(wire, 50)), 2),
                "p95_ms": round(float(np.percentile(wire, 95)), 2)}
        print(json.dumps({"wire": wire}), flush=True)

    code, stats = http_json(args.port, "GET", "/stats")
    first, last = windows[0], windows[-1]
    n_half = max(1, len(windows) // 2)
    p50_first = float(np.mean([w["p50_ms"] for w in windows[:n_half]]))
    p50_last = float(np.mean([w["p50_ms"] for w in windows[n_half:]]))
    summary = {
        "total_requests": args.ids_total + int(bool(args.wire_total))
        * args.wire_total,
        "wall_s": round(time.time() - t_start, 1),
        "windows": windows, "events": events, "wire": wire or None,
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": windows[-1]["rss_mb"],
        "rss_growth_mb": round(windows[-1]["rss_mb"] - windows[0]
                               ["rss_mb"], 1),
        "p50_drift_pct": round(100 * (p50_last - p50_first)
                               / max(p50_first, 1e-9), 2),
        "daemon_stats": stats,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("total_requests", "wall_s", "rss_growth_mb",
                       "p50_drift_pct", "events")}))


if __name__ == "__main__":
    main()
