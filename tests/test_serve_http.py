"""HTTP serving endpoint (serve_http): npy/JSON bodies, output selection,
health, error paths — driven through a real socket against the in-process
ThreadingHTTPServer."""

import io
import json
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.models import MNISTClassifier
from cnn_pde_tpu.serve import make_predict_fn
from cnn_pde_tpu.serve_http import serve_http


@pytest.fixture(scope="module")
def server():
    model = MNISTClassifier()
    params, state = model.init(__import__("jax").random.PRNGKey(0))
    fns = {o: make_predict_fn(model, params, state, output=o)
           for o in ("labels", "probs", "logits")}
    srv = serve_http(fns, port=0, background=True)
    yield srv, fns
    srv.shutdown()


def _post(url, body, content_type, accept=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": content_type,
                                          **({"Accept": accept}
                                             if accept else {})})
    return urllib.request.urlopen(req, timeout=60)


def test_http_predict_npy_and_json(server, rng):
    srv, fns = server
    base = f"http://{srv.host}:{srv.port}"
    batch = rng.random((4, 1, 28, 28)).astype(np.float32)
    want = np.asarray(fns["labels"](jnp.asarray(batch)))

    buf = io.BytesIO()
    np.save(buf, batch)
    with _post(f"{base}/predict?output=labels", buf.getvalue(),
               "application/x-npy") as r:
        out = json.load(r)
    assert out["output"] == "labels"
    assert out["data"] == want.tolist()

    with _post(f"{base}/predict?output=labels", json.dumps(batch.tolist()
               ).encode(), "application/json") as r:
        assert json.load(r)["data"] == want.tolist()

    # binary npy response
    with _post(f"{base}/predict?output=probs", buf.getvalue(),
               "application/x-npy", accept="application/x-npy") as r:
        probs = np.load(io.BytesIO(r.read()))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert probs.shape == (4, 10)


def test_http_health_and_errors(server):
    srv, _ = server
    base = f"http://{srv.host}:{srv.port}"
    with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
        health = json.load(r)
    assert health["ok"] and set(health["outputs"]) == {"labels", "probs",
                                                       "logits"}

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict?output=nope", b"{}", "application/json")
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict", b"not npy", "application/x-npy")
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nowhere", timeout=60)
    assert e.value.code == 404


def test_http_keep_alive_connection_reuse(server, rng):
    """HTTP/1.1 keep-alive: one socket serves many requests (2-2.5x
    front-end throughput, PERF.md §http-serving) — and a request after an
    error response still works on the same connection (Content-Length is
    set on every path, so the stream stays framed)."""
    import http.client

    srv, fns = server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=60)
    sockets = set()
    for _ in range(3):
        img = rng.random((1, 1, 28, 28)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        conn.request("POST", "/predict?output=labels", buf.getvalue(),
                     {"Content-Type": "application/x-npy",
                      "Accept": "application/x-npy"})
        r = conn.getresponse()
        data = r.read()
        assert r.status == 200 and r.version == 11
        np.testing.assert_array_equal(
            np.load(io.BytesIO(data), allow_pickle=False),
            np.asarray(fns["labels"](img)))
        sockets.add(id(conn.sock))

    conn.request("POST", "/predict", b"not npy",
                 {"Content-Type": "application/x-npy"})
    r = conn.getresponse()
    assert r.status == 400 and b"bad batch" in r.read()
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200 and json.loads(r.read())["ok"]
    sockets.add(id(conn.sock))
    conn.close()
    assert len(sockets) == 1, f"socket not reused: {len(sockets)}"


def test_http_metrics_endpoint(server, rng):
    """GET /metrics: counts, latency percentiles; with a MicroBatcher
    wrapped in, the coalescing ratio appears too."""
    srv, _ = server
    base = f"http://{srv.host}:{srv.port}"
    img = rng.random((3, 1, 28, 28)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    _post(f"{base}/predict?output=labels", buf.getvalue(),
          "application/x-npy").read()
    with urllib.request.urlopen(f"{base}/metrics", timeout=60) as r:
        m = json.load(r)
    assert m["requests"] >= 1 and m["images"] >= 3
    lat = m["predict_ms"]
    assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"]
    assert lat["window"] >= 1 and lat["mean"] > 0
    assert "microbatch" not in m  # plain fns: no dispatch stats

    from cnn_pde_tpu.serve_batch import MicroBatcher
    from cnn_pde_tpu.serve_http import serve_http

    mb_srv = serve_http({"labels": MicroBatcher(
        lambda x: np.zeros(x.shape[0]), max_batch=8)}, port=0,
        background=True)
    try:
        buf = io.BytesIO()
        np.save(buf, img)
        _post(f"http://{mb_srv.host}:{mb_srv.port}/predict",
              buf.getvalue(), "application/x-npy").read()
        with urllib.request.urlopen(
                f"http://{mb_srv.host}:{mb_srv.port}/metrics",
                timeout=60) as r:
            m = json.load(r)
        assert m["microbatch"]["requests"] == 1
        assert m["microbatch"]["dispatches"] == 1
        assert m["microbatch"]["coalescing"] == 1.0
    finally:
        mb_srv.shutdown()


def test_http_reload_hot_swaps_weights(rng):
    """POST /reload swaps predict fns atomically (serve CLI wires this to
    re-read --checkpoint-dir); micro-batch wrapping is re-applied, and a
    server without a reload_fn refuses with 400."""
    from cnn_pde_tpu.serve_http import serve_http

    def make(v):
        return lambda x: np.full((x.shape[0],), float(v), np.float32)

    version = {"v": 0}

    def reload_fn():
        version["v"] += 1
        return {"labels": make(version["v"])}

    srv = serve_http({"labels": make(0)}, port=0, background=True,
                     microbatch=4, reload_fn=reload_fn)
    base = f"http://{srv.host}:{srv.port}"
    img = rng.random((2, 1, 8, 8)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()
    try:
        def predict():
            with _post(f"{base}/predict", body, "application/x-npy",
                       accept="application/x-npy") as r:
                return np.load(io.BytesIO(r.read()), allow_pickle=False)

        np.testing.assert_array_equal(predict(), [0.0, 0.0])
        for expect in (1.0, 2.0):  # two consecutive hot swaps
            with _post(f"{base}/reload", b"", "application/json") as r:
                rep = json.load(r)
            assert rep["ok"] and rep["outputs"] == ["labels"]
            np.testing.assert_array_equal(predict(), [expect, expect])
        assert hasattr(next(iter(srv.predict_fns.values())),
                       "n_dispatches")  # microbatch re-wrapped on reload
    finally:
        srv.shutdown()

    srv2 = serve_http({"labels": make(9)}, port=0, background=True)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://{srv2.host}:{srv2.port}/reload", b"",
                  "application/json")
        assert e.value.code == 400
    finally:
        srv2.shutdown()


def test_reload_watch_follows_checkpoint_mtime(tmp_path, rng):
    """watch_and_reload: touching the watched file triggers a hot-swap
    within an interval; stopping the watcher stops further swaps."""
    import time

    from cnn_pde_tpu.serve_http import serve_http

    ckpt = tmp_path / "best.ckpt"
    ckpt.write_bytes(b"v0")
    version = {"v": 0}

    def reload_fn():
        version["v"] += 1
        v = version["v"]
        return {"labels": lambda x: np.full((x.shape[0],), float(v),
                                            np.float32)}

    srv = serve_http({"labels": lambda x: np.zeros(x.shape[0], np.float32)},
                     port=0, background=True, reload_fn=reload_fn,
                     reload_watch_paths=[str(ckpt)],
                     reload_watch_interval=0.1)
    img = rng.random((1, 1, 8, 8)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()

    def predict():
        with _post(f"http://{srv.host}:{srv.port}/predict", body,
                   "application/x-npy", accept="application/x-npy") as r:
            return float(np.load(io.BytesIO(r.read()),
                                 allow_pickle=False)[0])

    try:
        assert predict() == 0.0
        time.sleep(0.3)
        ckpt.write_bytes(b"v1")  # mtime advances -> watcher reloads
        deadline = time.time() + 5.0
        while time.time() < deadline and predict() == 0.0:
            time.sleep(0.1)
        assert predict() >= 1.0, "watcher never hot-swapped"
    finally:
        srv.shutdown()
    assert srv._watch_stop.is_set()  # shutdown stopped the watcher


def test_reload_under_concurrent_load(rng):
    """Hot-swap safety: concurrent predict traffic across repeated
    /reload calls never sees a failed or torn response — every reply is
    a complete, valid output from SOME weight version."""
    import threading
    import time

    from cnn_pde_tpu.serve_http import serve_http

    def make(v):
        return lambda x: np.full((x.shape[0],), float(v), np.float32)

    version = {"v": 0}

    def reload_fn():
        version["v"] += 1
        return {"labels": make(version["v"])}

    srv = serve_http({"labels": make(0)}, port=0, background=True,
                     microbatch=8, reload_fn=reload_fn)
    base = f"http://{srv.host}:{srv.port}"
    img = rng.random((1, 1, 8, 8)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()
    seen, errors = set(), []
    stop = threading.Event()

    def client():
        while not stop.is_set():
            try:
                with _post(f"{base}/predict", body, "application/x-npy",
                           accept="application/x-npy") as r:
                    out = np.load(io.BytesIO(r.read()),
                                  allow_pickle=False)
                assert out.shape == (1,)
                seen.add(float(out[0]))
            except Exception as e:  # any failure under swap is a bug
                errors.append(e)
                return

    threads = [threading.Thread(target=client) for _ in range(6)]
    try:
        for t in threads:
            t.start()
        for _ in range(5):  # five hot swaps under fire
            time.sleep(0.1)
            with _post(f"{base}/reload", b"", "application/json") as r:
                assert json.load(r)["ok"]
        time.sleep(0.2)
    finally:
        stop.set()
        for t in threads:
            t.join()
        srv.shutdown()
    assert not errors, errors[:3]
    assert len(seen) >= 3  # traffic really spanned several versions
    assert seen <= {float(v) for v in range(6)}


def test_http_full_stack_dp_buckets_microbatch_reload(rng, key):
    """Capstone composition: DP mesh (8 virtual devices) + shape buckets +
    micro-batching + hot-reload, all through the HTTP endpoint — odd-size
    concurrent requests shard cleanly and survive a weight swap."""
    import threading

    import jax

    from cnn_pde_tpu.parallel import make_mesh
    from cnn_pde_tpu.serve_http import serve_http

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(spatial=1)
    model = MNISTClassifier()
    params, state = model.init(key)
    params2, state2 = model.init(jax.random.PRNGKey(1))

    def fns_for(p, s):
        return {"labels": make_predict_fn(model, p, s, output="labels",
                                          mesh=mesh, buckets=(8, 32))}

    srv = serve_http(fns_for(params, state), port=0, background=True,
                     microbatch=16, microbatch_wait_ms=5.0,
                     reload_fn=lambda: fns_for(params2, state2))
    base = f"http://{srv.host}:{srv.port}"
    ref1 = make_predict_fn(model, params, state, output="labels",
                           buckets=(8, 32))
    ref2 = make_predict_fn(model, params2, state2, output="labels",
                           buckets=(8, 32))
    try:
        def post(img):
            buf = io.BytesIO()
            np.save(buf, img)
            with _post(f"{base}/predict", buf.getvalue(),
                       "application/x-npy",
                       accept="application/x-npy") as r:
                return np.load(io.BytesIO(r.read()), allow_pickle=False)

        # concurrent odd-size requests (coalesced totals pad to buckets
        # divisible by the 8-way 'data' axis)
        imgs = [rng.random((b, 1, 28, 28)).astype(np.float32)
                for b in (1, 3, 1, 5, 1, 1)]
        outs = [None] * len(imgs)
        ts = [threading.Thread(
            target=lambda i=i: outs.__setitem__(i, post(imgs[i])))
            for i in range(len(imgs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for img, out in zip(imgs, outs):
            np.testing.assert_array_equal(out, np.asarray(ref1(img)))

        with _post(f"{base}/reload", b"", "application/json") as r:
            assert json.load(r)["ok"]
        img = rng.random((5, 1, 28, 28)).astype(np.float32)
        np.testing.assert_array_equal(post(img), np.asarray(ref2(img)))
    finally:
        srv.shutdown()
