#!/usr/bin/env python
"""HTTP serving A/B: sequential dispatch vs dynamic micro-batching.

Drives the production endpoint (serve_http.py) end-to-end — HTTP parse,
predict dispatch, .npy response — with many CONCURRENT single-image
clients, and A/B's ``microbatch`` off vs on in ONE process (the CLAUDE.md
A/B methodology; both servers wrap the SAME warmed jit'd predict fn, so
the only variable is the batching policy).

The win scales with the per-dispatch fixed cost: ~24 ms per round trip on
the tunneled TPU (PERF.md §serving-args), ~100 µs locally.  N coalesced
singles cost ~1 dispatch instead of N because bs-1 and bs-64 device time
are nearly equal on the linearized path (PERF.md §linearized).

Usage:
    python tools/bench_http.py [--preset mnist] [--platform cpu]
        [--concurrency 32] [--requests 256] [--microbatch 64]
        [--wait-ms 5] [--no-linearize]

Prints one JSON line per mode plus a summary line with the speedup.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Client:
    """One keep-alive connection (HTTP/1.1 persistent) per worker thread;
    reconnects on drops (the stdlib server's listen backlog is 5, so a
    thundering herd of FRESH connections gets RSTs — with keep-alive each
    worker connects once and reuses, which is also what a real serving
    client does; retries are timed as part of the serving cost)."""

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.conn = None

    def post_npy(self, arr, retries=8):
        import http.client

        import numpy as np

        buf = io.BytesIO()
        np.save(buf, arr)
        body = buf.getvalue()
        headers = {"Content-Type": "application/x-npy",
                   "Accept": "application/x-npy"}
        for attempt in range(retries):
            try:
                if self.conn is None:
                    self.conn = http.client.HTTPConnection(
                        self.host, self.port, timeout=60)
                self.conn.request("POST", "/predict", body, headers)
                resp = self.conn.getresponse()
                data = resp.read()  # must drain to reuse the connection
                if resp.status != 200:
                    raise RuntimeError(f"HTTP {resp.status}: {data[:200]}")
                return np.load(io.BytesIO(data), allow_pickle=False)
            except (ConnectionError, http.client.HTTPException, OSError):
                self.close()
                if attempt == retries - 1:
                    raise
                time.sleep(0.005 * (attempt + 1))

    def close(self):
        if self.conn is not None:
            self.conn.close()
            self.conn = None


def _drive(host, port, images, n_requests, concurrency):
    """Fire n_requests single-image posts from `concurrency` keep-alive
    clients; returns (wall_s, results list ordered by request index)."""
    results = [None] * n_requests
    errors = []
    it = iter(range(n_requests))
    lock = threading.Lock()

    def worker():
        client = _Client(host, port)
        try:
            while True:
                with lock:
                    i = next(it, None)
                if i is None:
                    return
                try:
                    results[i] = client.post_npy(images[i % len(images)])
                except Exception as e:  # pragma: no cover - surfaced below
                    errors.append(e)
                    return
        finally:
            client.close()

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    return wall, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist")
    ap.add_argument("--platform", default=None,
                    help="e.g. 'cpu' to force the local platform")
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--microbatch", type=int, default=64)
    ap.add_argument("--wait-ms", type=float, default=5.0)
    ap.add_argument("--no-linearize", action="store_true",
                    help="skip linearize_pde_layers (defaults on: the "
                         "production serving configuration)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from cnn_pde_tpu.data import SYNTHETIC_SPECS
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.serve import linearize_pde_layers, make_predict_fn
    from cnn_pde_tpu.serve_http import serve_http
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(args.preset)
    channels, size, _ = SYNTHETIC_SPECS[preset.dataset]
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = [rng.random((1, channels, size, size)).astype(np.float32)
              for _ in range(8)]
    sample = np.concatenate(images)

    if not args.no_linearize:
        n = linearize_pde_layers(model, params, state, sample)
        print(f"# linearized {n} PDE layer(s)", file=sys.stderr)
    predict = make_predict_fn(model, params, state, output="labels")

    # Pre-compile every shape either mode will dispatch, so the A/B
    # measures steady-state serving, not compile time.
    buckets = sorted({1, 8, 32, args.microbatch})
    for b in buckets:
        np.asarray(predict(np.concatenate(
            [sample] * ((b + len(sample) - 1) // len(sample)))[:b]))

    report = {}
    for mode, mb in (("sequential", 0), ("microbatch", args.microbatch)):
        server = serve_http({"labels": predict}, port=0, background=True,
                            microbatch=mb, microbatch_wait_ms=args.wait_ms)
        host, port = server.host, server.port
        _drive(host, port, images, min(32, args.requests),
               args.concurrency)  # warm
        wall, results = _drive(host, port, images, args.requests,
                               args.concurrency)
        dispatches = args.requests
        if mb:
            batchers = list(server.predict_fns.values())
            dispatches = sum(b.n_dispatches for b in batchers)
            for b in batchers:
                b.close()
        server.shutdown()
        for i, r in enumerate(results):  # batching must be invisible
            expect = np.asarray(predict(images[i % len(images)]))
            np.testing.assert_array_equal(np.asarray(r), expect)
        row = {"mode": mode, "requests": args.requests,
               "concurrency": args.concurrency,
               "wall_s": round(wall, 4),
               "req_per_s": round(args.requests / wall, 1),
               "dispatches": dispatches}
        report[mode] = row
        print(json.dumps(row), flush=True)

    speedup = report["microbatch"]["req_per_s"] / report["sequential"]["req_per_s"]
    print(json.dumps({
        "metric": "http_serving_microbatch_speedup",
        "preset": args.preset,
        "value": round(speedup, 2), "unit": "x vs sequential dispatch",
        "dispatch_reduction": round(
            report["sequential"]["dispatches"]
            / max(report["microbatch"]["dispatches"], 1), 1)}))
    report["speedup"] = {"microbatch_speedup": round(speedup, 2)}
    from perf_record import record

    print("record:", record("bench_http", report,
                            extra={"preset": args.preset}))


if __name__ == "__main__":
    main()
