"""Multi-host bring-up tests (SURVEY.md §2.6 item 3).

Unit tests mock jax.distributed to pin down the three distinguishable
outcomes of ``initialize`` (already-initialized / single-process /
genuine failure propagates); the integration test runs a REAL 2-process
``jax.distributed`` group over loopback (CPU + Gloo collectives) and checks
a cross-process psum.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

import jax

from cnn_pde_tpu.parallel import initialize

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# mocked unit tests

def test_initialize_noop_when_already_initialized(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

    def boom(**kw):
        raise AssertionError("must not re-initialize")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert initialize() == "already_initialized"


def test_initialize_single_process_when_unconfigured(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def no_coordinator(**kw):
        raise ValueError("cannot auto-detect coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", no_coordinator)
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() == "single_process"


def test_initialize_propagates_failure_when_configured(monkeypatch):
    """A configured-but-broken coordinator must NOT be silently swallowed."""
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def bad(**kw):
        raise ValueError("bad coordinator spec")

    monkeypatch.setattr(jax.distributed, "initialize", bad)
    with pytest.raises(ValueError):
        initialize(coordinator_address="broken:0", num_processes=2,
                   process_id=0)


def test_initialize_propagates_env_configured_failure(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def bad(**kw):
        raise ValueError("cannot reach coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", bad)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:1234")
    with pytest.raises(ValueError):
        initialize()


def test_initialize_propagates_runtime_failure(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def bad(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", bad)
    with pytest.raises(RuntimeError):
        initialize(coordinator_address="host:1", num_processes=2,
                   process_id=0)


def test_initialize_runtime_already_initialized(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def already(**kw):
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    assert initialize() == "already_initialized"


def test_initialize_success(monkeypatch):
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    seen = {}

    def ok(**kw):
        seen.update(kw)

    monkeypatch.setattr(jax.distributed, "initialize", ok)
    assert initialize(coordinator_address="host:9", num_processes=4,
                      process_id=2) == "initialized"
    assert seen == {"coordinator_address": "host:9", "num_processes": 4,
                    "process_id": 2}


# --------------------------------------------------------------------------
# real 2-process integration test

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from cnn_pde_tpu.parallel import initialize
    pid = int(sys.argv[1])
    out = initialize(coordinator_address={addr!r}, num_processes=2,
                     process_id=pid)
    assert out == "initialized", out
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    mesh = Mesh(jax.devices(), ("d",))
    f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "d"), mesh=mesh,
                          in_specs=P("d"), out_specs=P()))
    x = jnp.asarray(np.arange(len(jax.devices()), dtype=np.float32))
    print("PSUM", float(np.asarray(f(x))[0]), flush=True)
""")


def test_two_process_bringup_and_psum():
    """Real jax.distributed 2-process group over loopback: both processes
    initialize through cnn_pde_tpu.parallel.initialize and agree on a
    cross-process psum (1 CPU device per process → psum(0+1) == 1)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        addr = f"localhost:{s.getsockname()[1]}"
    script = _WORKER.format(repo=REPO, addr=addr)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              env={**os.environ, "JAX_PLATFORMS": "cpu",
                                   "XLA_FLAGS": ""})
             for pid in (0, 1)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "PSUM 1.0" in out, out


_DATA_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from cnn_pde_tpu.parallel import (global_batch_from_local, initialize,
                                      local_batch_slice)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pid = int(sys.argv[1])
    assert initialize(coordinator_address={addr!r}, num_processes=2,
                      process_id=pid) == "initialized"

    # the canonical multi-host data path: a deterministic global batch of
    # which THIS process materializes only its local_batch_slice rows
    B = 8
    full = np.arange(B * 3, dtype=np.float32).reshape(B, 3)
    labels = np.arange(B, dtype=np.int32) % 3
    start, size = local_batch_slice(B)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    gx, gy = global_batch_from_local(
        mesh, (full[start:start + size], labels[start:start + size]))
    assert gx.shape == (B, 3) and gy.shape == (B,), (gx.shape, gy.shape)

    rep = NamedSharding(mesh, P())
    f = jax.jit(lambda x, y: jnp.mean(x) + jnp.mean(y.astype(jnp.float32)),
                out_shardings=rep)
    got = float(np.asarray(f(gx, gy)))
    want = float(full.mean() + labels.astype(np.float32).mean())
    assert abs(got - want) < 1e-5, (got, want)
    print("GLOBALMEAN", got, flush=True)
""")


def test_two_process_global_batch_from_local():
    """global_batch_from_local over a real 2-process group: each process
    holds only its local_batch_slice rows; the assembled global arrays have
    the full batch shape and a jitted cross-process reduction over them
    equals the single-host full-batch value."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        addr = f"localhost:{s.getsockname()[1]}"
    script = _DATA_WORKER.format(repo=REPO, addr=addr)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              env={**os.environ, "JAX_PLATFORMS": "cpu",
                                   "XLA_FLAGS": ""})
             for pid in (0, 1)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "GLOBALMEAN" in out, out


_DP_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    import optax
    from cnn_pde_tpu.nn import Flatten, Linear, Sequential
    from cnn_pde_tpu.parallel import (initialize, make_dp_train_step,
                                      replicate, shard_batch)
    from cnn_pde_tpu.parallel.data_parallel import make_train_step_body
    from jax.sharding import Mesh

    pid = int(sys.argv[1])
    assert initialize(coordinator_address={addr!r}, num_processes=2,
                      process_id=pid) == "initialized"

    model = Sequential([Flatten(), Linear(12, 3)])
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    B = 8
    images = rng.random((B, 1, 3, 4)).astype(np.float32)
    labels = (np.arange(B) % 3).astype(np.int32)

    # single-device reference on the full batch (process-local)
    body = make_train_step_body(model, opt, label_smoothing=0.0)
    _, _, _, ref_loss = jax.jit(body)(
        params, state, opt_state, jnp.asarray(images), jnp.asarray(labels),
        jax.random.PRNGKey(1))
    ref = float(np.asarray(ref_loss))

    # cross-process DP: mesh spans both processes' devices; each host
    # feeds only its local half of the batch via shard_batch
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1, 1),
                ("data", "spatial", "model"))
    step = make_dp_train_step(model, opt, mesh, label_smoothing=0.0)
    p_r, s_r, o_r = (replicate(mesh, t) for t in (params, state, opt_state))
    imgs_s, labels_s = shard_batch(mesh, (images, labels))
    assert imgs_s.shape == (B, 1, 3, 4), imgs_s.shape
    p2, _, _, loss = step(p_r, s_r, o_r, imgs_s, labels_s,
                          jax.random.PRNGKey(1))
    got = float(np.asarray(loss))
    assert abs(got - ref) < 1e-5, (got, ref)
    print("DPLOSS", got, flush=True)
""")


def test_two_process_dp_train_step():
    """A full DP train step over a mesh spanning two real processes: each
    host feeds only its local batch rows through shard_batch, params enter
    via the multi-process replicate, and the cross-process loss equals the
    single-device full-batch loss."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        addr = f"localhost:{s.getsockname()[1]}"
    script = _DP_WORKER.format(repo=REPO, addr=addr)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              env={**os.environ, "JAX_PLATFORMS": "cpu",
                                   "XLA_FLAGS": ""})
             for pid in (0, 1)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "DPLOSS" in out, out
