"""Dynamic micro-batching for serving: coalesce concurrent requests into
one device dispatch.

The reference has no serving story (SURVEY.md §3.5); this is the batching
policy layer between the HTTP endpoint (serve_http.py) and the jit'd
predict fn.  Each predict dispatch pays a fixed cost — on a tunneled TPU a
round trip is ~24 ms (PERF.md §serving-args latency column), and even
locally a dispatch is ~100 µs — while the device time for bs 1 vs bs 64 is
nearly identical on the linearized path (0.137 vs 0.093 ms/batch, PERF.md).
So N concurrent single-image requests served one-by-one cost N dispatches;
coalesced they cost ONE.

``MicroBatcher`` wraps any callable(images)->outputs whose first axis is
the batch: requests enqueue their arrays and block; a worker thread takes
the first waiting request, drains whatever else arrives within
``max_wait_ms`` (up to ``max_batch`` rows), concatenates along axis 0,
PADS the total to the next size in ``buckets`` (so jit sees a few fixed
shapes, not one compile per distinct total), runs ONE predict, and
scatters the slices back.  Up to ``pipeline`` coalesced batches dispatch
concurrently (a small thread pool), so successive device round trips
overlap instead of serializing behind each blocking fetch.  Identity
semantics: outputs equal per-request calls exactly (padding rows are
discarded; tested).

Use via ``serve_http(..., microbatch=...)`` / the serve CLI's
``--microbatch`` or directly:

    predict = make_predict_fn(model, params, state, output="labels")
    batched = MicroBatcher(predict, max_batch=64, max_wait_ms=2.0)
    labels = batched(images)          # thread-safe, coalesces with peers
    batched.close()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["MicroBatcher"]

_SENTINEL = object()


class _Request:
    __slots__ = ("array", "event", "result", "error")

    def __init__(self, array):
        self.array = array
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Thread-safe dynamic batching wrapper around a batched predict fn.

    ``buckets``: ascending batch sizes to pad dispatch totals to (caps jit
    compile count).  Totals above the largest bucket dispatch unpadded
    (one extra compile per distinct oversize total — rare, since
    ``_collect`` stops draining at ``max_batch`` rows and max_batch is
    always a bucket).  ``max_wait_ms`` bounds added latency: the first
    request in a batch waits at most this long for company.
    """

    def __init__(self, predict_fn, max_batch=64, max_wait_ms=2.0,
                 buckets=(1, 8, 32, 64), pipeline=2):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.predict_fn = predict_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.buckets = tuple(sorted(set(int(b) for b in buckets)
                                    | {self.max_batch}))
        self.n_dispatches = 0
        self.n_requests = 0
        self._q = queue.Queue()
        self._closed = False
        # ``pipeline`` coalesced batches may be in flight at once: the
        # collector thread hands each batch to this pool and immediately
        # goes back to draining the queue, so the NEXT batch's device
        # round trip overlaps the previous one's (on a tunneled TPU a
        # blocking fetch is ~24 ms — serial dispatch would cap throughput
        # at 1/RTT regardless of coalescing).  pipeline=1 restores strict
        # serial dispatch.
        self._pool = ThreadPoolExecutor(
            max_workers=max(1, int(pipeline)),
            thread_name_prefix="microbatch-dispatch")
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---------------- client side ----------------

    def __call__(self, images):
        """Enqueue a (b, ...) request and block for its outputs."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        arr = np.asarray(images)
        if arr.ndim < 1 or arr.shape[0] < 1:
            raise ValueError(f"need a batched array, got shape {arr.shape}")
        req = _Request(arr)
        self._q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        """Stop the worker (drains nothing new; in-flight requests finish)."""
        if not self._closed:
            self._closed = True
            self._q.put(_SENTINEL)
            self._worker.join(timeout=10)
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------- worker side ----------------

    def _collect(self):
        """One coalescing round: block for the first request, then drain
        until max_batch rows or the max_wait deadline."""
        first = self._q.get()
        if first is _SENTINEL:
            return None
        batch, rows = [first], first.array.shape[0]
        t_end = time.monotonic() + self.max_wait_s
        while rows < self.max_batch:
            timeout = t_end - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if req is _SENTINEL:
                self._q.put(_SENTINEL)  # re-post for the outer loop
                break
            batch.append(req)
            rows += req.array.shape[0]
        return batch

    def _bucket(self, n):
        for b in self.buckets:
            if b >= n:
                return b
        return n  # above the largest bucket: dispatch unpadded

    def _run(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            self._pool.submit(self._dispatch_safe, batch)

    def _dispatch_safe(self, batch):
        try:
            self._dispatch(batch)
        except Exception as e:  # surface to every waiter, keep serving
            for req in batch:
                req.error = e
                req.event.set()

    def _dispatch(self, batch):
        arrays = [req.array for req in batch]
        total = sum(a.shape[0] for a in arrays)
        stacked = arrays[0] if len(arrays) == 1 else np.concatenate(arrays)
        target = self._bucket(total)
        if target > total:
            # pad by repeating the last row: always a valid input, and the
            # padded rows' outputs are sliced off below
            pad = np.broadcast_to(stacked[-1:],
                                  (target - total,) + stacked.shape[1:])
            stacked = np.concatenate([stacked, pad])
        out = np.asarray(self.predict_fn(stacked))
        with self._stats_lock:
            self.n_dispatches += 1
            self.n_requests += len(batch)
        ofs = 0
        for req, arr in zip(batch, arrays):
            b = arr.shape[0]
            req.result = out[ofs:ofs + b]
            ofs += b
            req.event.set()
