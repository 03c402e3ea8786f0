"""HTTP serving daemon (serve_http.py): coalescing batcher semantics,
/embed + /match + /healthz over a real AOT artifact, concurrency, and
error paths."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crfr.serve_http import EmbedService, make_server


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read(), r.headers.get("Content-Type", "")


# ---------------------------------------------------------------------------
# EmbedService (no HTTP)
# ---------------------------------------------------------------------------


def test_service_pads_and_chunks():
    """Any request size works against a static batch-8 fn: padding is
    stripped, oversize requests chunk across multiple dispatches."""
    calls = []

    def fn(x):
        assert x.shape[0] == 8          # the static batch, always
        calls.append(1)
        return x.reshape(8, -1)[:, :4] * 2.0

    svc = EmbedService(fn, batch=8, window_ms=1.0)
    try:
        x = np.arange(3 * 2 * 2 * 3, dtype=np.float32).reshape(3, 2, 2, 3)
        y = svc.submit(x)
        assert y.shape == (3, 4)
        np.testing.assert_allclose(y, x.reshape(3, -1)[:, :4] * 2.0)
        big = np.ones((19, 2, 2, 3), np.float32)   # 19 rows → 3 dispatches
        y = svc.submit(big)
        assert y.shape == (19, 4)
    finally:
        svc.close()


def test_service_coalesces_concurrent_requests():
    """Concurrent 1-row submissions share device dispatches."""
    def fn(x):
        return x.reshape(x.shape[0], -1)[:, :2]

    svc = EmbedService(fn, batch=16, window_ms=50.0)
    try:
        results = {}

        def client(i):
            x = np.full((1, 2, 2, 3), i, np.float32)
            results[i] = svc.submit(x)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            assert results[i].shape == (1, 2)
            assert results[i][0, 0] == i           # right rows to right caller
        assert svc.dispatches < 8, svc.dispatches  # actually coalesced
    finally:
        svc.close()


def test_service_error_propagates():
    def fn(x):
        raise RuntimeError("boom")

    svc = EmbedService(fn, batch=4, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            svc.submit(np.zeros((2, 2, 2, 3), np.float32))
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# HTTP end-to-end over a real AOT artifact (tiny linear embed)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_server():
    from jax import export as jexport
    from crfr.eval.bank import quantize_bank
    from crfr.serve import build_serving_fn

    size, dim, batch = 16, 32, 8
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (size * size * 3, dim)), jnp.float32)
    fn = build_serving_fn(lambda x: x.reshape(x.shape[0], -1) @ w,
                          image_size=size)
    spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    call = lambda x: exported.call(x)              # noqa: E731
    meta = {"batch": batch, "image_size": size, "embedding_dim": dim,
            "input_dtype": "uint8"}

    gal = rng.normal(0, 1, (50, dim)).astype(np.float32)
    bank = quantize_bank(gal, np.arange(100, 150))

    srv = make_server(call, meta, port=0, bank=bank, window_ms=1.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", call, meta, bank, gal
    srv.shutdown()
    srv.service.close()
    srv.server_close()


def test_http_healthz(http_server):
    url, *_ = http_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["ok"] and info["meta"]["batch"] == 8
    assert info["gallery"] == 50


def test_http_embed_matches_direct(http_server):
    url, call, meta, _, _ = http_server
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
    status, body, ctype = _post(url + "/embed", _npy(x))
    assert status == 200 and ctype == "application/octet-stream"
    got = np.load(io.BytesIO(body))
    pad = np.zeros((5, 16, 16, 3), np.uint8)
    want = np.asarray(call(np.concatenate([x, pad])))[:3]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_http_match_finds_gallery_row(http_server):
    url, call, meta, bank, gal = http_server
    # probe = exact gallery embeddings → top-1 label must be that row's
    probes = gal[[7, 31]]
    status, body, _ = _post(url + "/match?k=3", _npy(probes))
    assert status == 200
    out = json.loads(body)
    assert out["k"] == 3 and out["gallery"] == 50
    assert [m["labels"][0] for m in out["matches"]] == [107, 131]


def test_http_match_bucketing_and_approx(http_server):
    """Varying probe counts / k are padded to (N≥32, k≥16) buckets (one
    compiled scan program per bucket, not per request shape); approx=1
    routes through approx_max_k selection. Results unchanged."""
    url, call, meta, bank, gal = http_server
    for probes, k, want in ((gal[[5]], 2, [105]),
                            (gal[[9, 11, 40]], 4, [109, 111, 140])):
        status, body, _ = _post(url + f"/match?k={k}&approx=1", _npy(probes))
        assert status == 200
        out = json.loads(body)
        assert out["k"] == k
        assert [m["labels"][0] for m in out["matches"]] == want
        assert all(len(m["labels"]) == k for m in out["matches"])
    # ?recall=0.999 sets the approx_max_k recall_target (implies approx;
    # the serving mitigation for bin-aliased galleries — _approx_cfg)
    status, body, _ = _post(url + "/match?k=2&recall=0.999", _npy(gal[[5]]))
    assert status == 200
    assert json.loads(body)["matches"][0]["labels"][0] == 105
    try:
        _post(url + "/match?k=2&recall=abc", _npy(gal[[5]]))
        raise AssertionError("should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_http_error_paths(http_server):
    url, *_ = http_server
    # bad body
    try:
        _post(url + "/embed", b"not npy")
        raise AssertionError("should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # bad shape
    try:
        _post(url + "/embed", _npy(np.zeros((3, 4), np.float32)))
        raise AssertionError("should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # wrong spatial size: must 400 BEFORE coalescing (a wrong-shape
    # request inside a shared batch used to 500 every request in it)
    try:
        _post(url + "/embed", _npy(np.zeros((1, 24, 24, 3), np.uint8)))
        raise AssertionError("should 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "(B, 16, 16, 3)" in json.loads(e.read())["error"]
    # a concurrent valid request is unaffected
    st, _, _ = _post(url + "/embed", _npy(np.zeros((1, 16, 16, 3), np.uint8)))
    assert st == 200
    # unknown path
    try:
        _post(url + "/nope", _npy(np.zeros((1, 16, 16, 3), np.uint8)))
        raise AssertionError("should 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_service_window_is_absolute_deadline():
    """A steady sub-window trickle must not extend the first request's
    wait: the coalescing deadline is absolute, not per-arrival."""
    import time

    def fn(x):
        return x.reshape(x.shape[0], -1)[:, :2]

    svc = EmbedService(fn, batch=64, window_ms=40.0)
    try:
        results = []

        def one(i):
            t0 = time.monotonic()
            svc.submit(np.full((1, 2, 2, 3), i, np.float32))
            results.append(time.monotonic() - t0)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
            time.sleep(0.015)           # trickle: 15 ms < 40 ms window
        for t in threads:
            t.join()
        # per-arrival restarts would hold the first request ~6×15 ms+40 ms;
        # the absolute deadline caps the whole batch at ~window + slack
        assert max(results) < 0.5, results
        assert time.monotonic() - t0 < 1.0
    finally:
        svc.close()
