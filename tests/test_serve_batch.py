"""MicroBatcher (serve_batch.py): coalescing correctness + HTTP wiring.

The batching policy must be INVISIBLE in the results: outputs equal
per-request predictions exactly, padding rows discarded, errors surfaced
to every coalesced waiter without killing the worker.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from cnn_pde_tpu.serve_batch import MicroBatcher


class CountingPredict:
    """Deterministic per-row fn that records dispatch batch sizes."""

    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def __call__(self, x):
        with self.lock:
            self.batches.append(int(x.shape[0]))
        return np.sum(np.asarray(x), axis=tuple(range(1, x.ndim))) * 2.0


@pytest.mark.quick
def test_results_match_per_request():
    fn = CountingPredict()
    rng = np.random.default_rng(0)
    with MicroBatcher(fn, max_batch=16, max_wait_ms=20.0) as mb:
        reqs = [rng.random((b, 3, 4)).astype(np.float32)
                for b in (1, 2, 1, 5, 1)]
        results = [None] * len(reqs)

        def worker(i):
            results[i] = mb(reqs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for r, x in zip(results, reqs):
        np.testing.assert_array_equal(r, fn(x))
    assert mb.n_requests == len(reqs)


def test_coalesces_concurrent_singles():
    """N concurrent bs-1 requests must land in FEWER dispatches, padded to
    a bucket size, with every result still per-request exact."""
    fn = CountingPredict()
    mb = MicroBatcher(fn, max_batch=32, max_wait_ms=50.0, buckets=(1, 8, 32))
    n = 8
    xs = [np.full((1, 2), float(i), np.float32) for i in range(n)]
    results = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        results[i] = mb(xs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()

    for i in range(n):
        np.testing.assert_allclose(results[i], [i * 2.0 * 2])
    # the barrier makes all 8 queue near-simultaneously; the worker takes 1
    # then drains the rest inside the 50 ms window — strictly fewer
    # dispatches than requests, and every dispatch size is a bucket size
    served = [b for b in fn.batches]
    assert len(served) < n, served
    assert all(b in (1, 8, 32) for b in served), served


def test_oversize_requests_pass_through():
    fn = CountingPredict()
    with MicroBatcher(fn, max_batch=4, max_wait_ms=1.0) as mb:
        x = np.ones((9, 2), np.float32)  # above every bucket
        np.testing.assert_array_equal(mb(x), fn(x))


def test_error_propagates_and_worker_survives():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return np.zeros((x.shape[0],), np.float32)

    with MicroBatcher(flaky, max_batch=4, max_wait_ms=1.0) as mb:
        with pytest.raises(RuntimeError, match="boom"):
            mb(np.ones((1, 2), np.float32))
        # worker must still be alive and serving
        out = mb(np.ones((2, 2), np.float32))
        assert out.shape == (2,)


def test_http_microbatch_end_to_end():
    """serve_http(microbatch=...) serves coalesced predictions over HTTP."""
    from cnn_pde_tpu.serve_http import serve_http

    fn = CountingPredict()
    server = serve_http({"labels": fn}, port=0, background=True,
                        microbatch=16, microbatch_wait_ms=10.0)
    try:
        url = f"http://{server.host}:{server.port}"
        xs = [np.full((1, 2), float(i), np.float32) for i in range(4)]
        results = [None] * len(xs)

        def post(i):
            body = json.dumps(xs[i].tolist()).encode()
            req = urllib.request.Request(
                f"{url}/predict", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as resp:
                results[i] = json.loads(resp.read())["data"]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(xs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(len(xs)):
            np.testing.assert_allclose(results[i], [i * 2.0 * 2])
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as resp:
            assert json.loads(resp.read())["ok"]
    finally:
        server.shutdown()
