"""Debugging / observability utilities (SURVEY.md §5):

* ``nan_guard`` — checkify-based NaN/Inf detection for a jitted function, the
  principled replacement for the reference's scattered eps-clamps.
* ``profile_trace`` — jax.profiler trace context for TensorBoard-viewable
  device profiles.
* ``step_timer`` — lightweight wall-clock step timing (the reference's
  time.time() epoch timing, per-step).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["nan_guard", "profile_trace", "step_timer", "annotate"]


def nan_guard(fn):
    """Wrap a function so NaN/Inf anywhere in its computation raises a
    checkify error with location info:

        guarded = nan_guard(train_step)
        err, out = jax.jit(guarded)(...)
        err.throw()  # no-op when clean
    """
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


@contextlib.contextmanager
def profile_trace(logdir="/tmp/jax-trace"):
    """Capture a device profile viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace span for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class step_timer:
    """Accumulates blocked step timings: with t.measure(out): ..."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def mean_ms(self):
        return 1000.0 * sum(self.times) / max(len(self.times), 1)
