"""Load test for the HTTP serving front end (VERDICT r4 next-round #8).

Measures p50/p95/p99 latency and aggregate throughput of POST
/v1/encode_text under concurrent clients, across --batch-window-ms values —
the dynamic micro-batching tradeoff: a longer window coalesces more
concurrent requests into one engine call (higher throughput, better MXU
occupancy) at the cost of added latency for a lone client.

Weights are random (zero-egress host; latency is architecture-, not
value-dependent). Runs on the default backend — the real TPU chip when
available. Results land in a markdown table on stdout plus one JSON line.

Usage: python scripts/serve_loadtest.py [--model ViT-B-32]
           [--windows 0 5 20] [--concurrency 1 8 32] [--requests 40]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TEXTS = [
    "a photo of a cat", "two dogs running on the beach",
    "an aerial view of a city at night", "a bowl of fresh fruit",
]


def _client(base, n_requests, lat_out, idx):
    import urllib.request

    for i in range(n_requests):
        body = json.dumps({"texts": [TEXTS[(idx + i) % len(TEXTS)]]}).encode()
        req = urllib.request.Request(
            base + "/v1/encode_text", data=body,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read()
        lat_out.append(time.perf_counter() - t0)


def run_point(engine, preprocess, tokenizer, window_ms, concurrency, n_requests):
    from refining_clip_via_dinov2_representations_tpu.serve import (
        ClipServer,
        make_http_server,
    )

    server = ClipServer(engine, preprocess, tokenizer, batch_window_ms=window_ms)
    httpd = make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        lats: list = []
        _client(base, 3, [], 0)  # per-point warmup (server threads, socket)
        threads = [
            threading.Thread(target=_client, args=(base, n_requests, lats, c))
            for c in range(concurrency)
        ]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        lats.sort()
        q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3
        return {
            "window_ms": window_ms,
            "concurrency": concurrency,
            "requests": len(lats),
            "p50_ms": round(q(0.50), 2),
            "p95_ms": round(q(0.95), 2),
            "p99_ms": round(q(0.99), 2),
            "mean_ms": round(statistics.mean(lats) * 1e3, 2),
            "req_per_s": round(len(lats) / wall, 2),
        }
    finally:
        httpd.shutdown()
        server.close()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--windows", type=float, nargs="+", default=[0.0, 5.0, 20.0])
    p.add_argument("--concurrency", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--requests", type=int, default=40,
                   help="requests per client thread")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32, 64])
    a = p.parse_args(argv)

    import jax

    from refining_clip_via_dinov2_representations_tpu.inference import (
        create_engine,
    )

    backend = jax.default_backend()
    engine, preprocess, tokenizer = create_engine(
        a.model, buckets=tuple(a.buckets)
    )
    print(f"backend={backend} model={a.model} buckets={engine.buckets}",
          file=sys.stderr, flush=True)
    engine.warmup()  # compile every bucket before timing anything
    # prime a dispatch from a non-main thread before the timed points: the
    # tunneled backend intermittently hard-aborts on a fresh thread's first
    # dispatch; do it here where a crash wastes seconds, not a full table
    th = threading.Thread(
        target=lambda: engine.encode_text(
            __import__("numpy").asarray(tokenizer(["warm"]), dtype="int32"))
    )
    th.start(); th.join()

    rows = []
    print("| window_ms | clients | p50 ms | p95 ms | p99 ms | req/s |")
    print("|---|---|---|---|---|---|")
    for window in a.windows:
        for conc in a.concurrency:
            r = run_point(engine, preprocess, tokenizer, window, conc, a.requests)
            rows.append(r)
            print(
                f"| {window:g} | {conc} | {r['p50_ms']} | {r['p95_ms']} |"
                f" {r['p99_ms']} | {r['req_per_s']} |", flush=True,
            )
    print(json.dumps({"backend": backend, "model": a.model, "points": rows}))


if __name__ == "__main__":
    main()
