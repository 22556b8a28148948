"""Time-bounded device-platform probe.

The environment's default platform can be a REMOTE plugin (a tunneled TPU)
that fails in two distinct ways: raising at version handshake (e.g. libtpu
mismatch) or HANGING indefinitely under pool congestion.  An in-process
``jax.devices()`` therefore either poisons the process or wedges it — so
callers that need to decide "is the platform usable?" (bench.py, the
driver's ``__graft_entry__.dryrun_multichip``) probe in a subprocess with a
deadline and act on the outcome.
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["probe_devices"]


def probe_devices(min_devices: int = 1, timeout: float = 180.0):
    """Return ``(ok, detail)``: whether >= ``min_devices`` jax devices are
    usable on the default platform, probed in a subprocess bounded by
    ``timeout`` seconds.  ``detail`` always says what actually happened
    (device count, the probe's last stderr line, or the timeout) so failure
    modes stay distinguishable — a version mismatch must not be reported as
    congestion or as a device count."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False, (f"probe timed out after {timeout:.0f}s — remote "
                       "platform stalled (tunnel down or pool congestion)")
    if proc.returncode != 0:
        err = (proc.stderr or "").strip().splitlines()
        return False, (f"platform init failed (rc={proc.returncode}): "
                       f"{err[-1] if err else 'no stderr'}")
    try:
        n = int(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return False, f"unparseable probe output {proc.stdout!r}"
    if n < min_devices:
        return False, f"only {n} usable device(s) (< {min_devices})"
    return True, f"{n} usable device(s)"
