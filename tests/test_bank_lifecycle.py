"""Bank lifecycle (eval/bank.py): append/remove host ops, the
capacity-padded ServingBank (online enroll/remove/snapshot, locked
consistent views under concurrent mutation, auto-label uniqueness,
int32 device-label guard), and the serve-http mutable-gallery endpoints.

Pins the contracts the lifecycle docstrings state: append_bank is
bitwise a rebuild of the union, remove never perturbs surviving rows,
ServingBank snapshots equal the host rebuild, and topk_matches_bank
fetches ServingBank state as one locked view (no torn mixed-capacity
triple)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from crfr.eval.bank import (QuantBank, ServingBank, append_bank, load_bank,
                            quantize_bank, remove_bank, save_bank,
                            topk_matches_bank)


def _embs(rng, n, dim=32):
    """Well-separated rows: one dominant axis each + small noise, so
    top-1 self-matching is unambiguous far above int8 noise."""
    e = np.eye(dim, dtype=np.float32)[np.arange(n) % dim]
    return (e + rng.normal(0, 0.03, e.shape)).astype(np.float32)


# ---------------------------------------------------------------------------
# host lifecycle ops
# ---------------------------------------------------------------------------


def test_append_bitwise_equals_rebuild(rng):
    a = rng.normal(0, 1, (13, 24)).astype(np.float32)
    b = rng.normal(0, 1, (7, 24)).astype(np.float32)
    la, lb = np.arange(13), np.arange(100, 107)
    grown = append_bank(quantize_bank(a, la), b, lb)
    rebuilt = quantize_bank(np.concatenate([a, b]), np.concatenate([la, lb]))
    assert (grown.q == rebuilt.q).all()
    assert (grown.scale == rebuilt.scale).all()
    assert (grown.labels == rebuilt.labels).all()
    assert grown.labels.dtype == np.int64


def test_append_auto_labels_and_validation(rng):
    bank = quantize_bank(rng.normal(0, 1, (5, 16)), [3, 9, 1, 0, 2])
    grown = append_bank(bank, rng.normal(0, 1, (3, 16)))
    assert grown.labels[-3:].tolist() == [10, 11, 12]   # past current max
    with pytest.raises(ValueError, match="labels"):
        append_bank(bank, rng.normal(0, 1, (3, 16)), labels=[1, 2])


def test_remove_leaves_rows_untouched(rng):
    x = rng.normal(0, 1, (10, 16)).astype(np.float32)
    bank = quantize_bank(x, np.arange(10))
    out = remove_bank(bank, [2, 5, 5, 7])           # dup labels tolerated
    keep = [0, 1, 3, 4, 6, 8, 9]
    assert out.labels.tolist() == keep
    assert (out.q == bank.q[keep]).all()            # survivors bitwise
    assert (out.scale == bank.scale[keep]).all()


# ---------------------------------------------------------------------------
# ServingBank
# ---------------------------------------------------------------------------


def _sb(rng, n=6, dim=32, slab=16):
    x = _embs(rng, n, dim)
    return ServingBank.from_bank(quantize_bank(x, np.arange(n)),
                                 slab=slab), x


def test_serving_enroll_snapshot_equals_host_rebuild(rng):
    sb, x0 = _sb(rng)
    x1 = rng.normal(0, 1, (3, 32)).astype(np.float32)
    x2 = rng.normal(0, 1, (2, 32)).astype(np.float32)
    got1 = sb.enroll(x1, labels=[10, 11, 12])
    got2 = sb.enroll(x2)                             # auto: 13, 14
    assert got1.tolist() == [10, 11, 12]
    assert got2.tolist() == [13, 14]
    assert len(sb) == 11
    snap = sb.snapshot()
    want = append_bank(append_bank(quantize_bank(x0, np.arange(6)),
                                   x1, [10, 11, 12]), x2, [13, 14])
    assert snap.labels.dtype == np.int64             # widened back from i32
    assert (snap.q == want.q).all()
    assert (snap.scale == want.scale).all()
    assert (snap.labels == want.labels).all()


def test_serving_remove_tombstones_and_scan(rng):
    sb, x = _sb(rng, n=8)
    assert sb.remove([2, 5]) == 2
    assert sb.remove([2]) == 0                       # already dead
    assert len(sb) == 6
    assert set(sb.snapshot().labels.tolist()) == {0, 1, 3, 4, 6, 7}
    # the SAME compiled scan keeps serving: tombstoned labels never surface
    s, l = topk_matches_bank(x, sb, k=4)
    assert not np.isin(l, [2, 5]).any()
    # self top-1 for surviving probes
    for i in [0, 1, 3, 4, 6, 7]:
        assert l[i, 0] == i


def test_serving_scan_parity_with_compacted_host_bank(rng):
    sb, _ = _sb(rng, n=10)
    sb.enroll(rng.normal(0, 1, (5, 32)).astype(np.float32))
    sb.remove([1, 12])
    probes = rng.normal(0, 1, (4, 32)).astype(np.float32)
    s_dev, l_dev = topk_matches_bank(probes, sb, k=5)
    s_host, l_host = topk_matches_bank(probes, sb.snapshot(), k=5)
    # identical rows/scales → identical int32 dots → identical scores;
    # capacity padding is masked to −inf so it can't enter the top-k
    np.testing.assert_array_equal(l_dev, l_host)
    np.testing.assert_array_equal(s_dev, s_host)


def test_serving_grow_preserves_rows(rng):
    sb, x0 = _sb(rng, n=6, slab=16)                  # capacity 16
    assert sb.capacity == 16
    big = rng.normal(0, 1, (20, 32)).astype(np.float32)
    sb.enroll(big)                                   # needs a grow
    assert sb.capacity >= 26 and sb.capacity % 16 == 0
    snap = sb.snapshot()
    want = append_bank(quantize_bank(x0, np.arange(6)), big)
    assert (snap.q == want.q).all()
    assert (snap.labels == want.labels).all()


def test_serving_snapshot_roundtrips_save(rng, tmp_path):
    sb, _ = _sb(rng)
    sb.enroll(rng.normal(0, 1, (2, 32)).astype(np.float32))
    path = str(tmp_path / "bank.npz")
    save_bank(path, sb.snapshot())
    back = load_bank(path)
    assert back.labels.dtype == np.int64 and len(back) == 8


def test_concurrent_auto_label_enrolls_are_unique(rng):
    sb, _ = _sb(rng, n=4, slab=16)
    errs = []

    def worker(seed):
        try:
            r = np.random.default_rng(seed)
            for _ in range(8):
                sb.enroll(r.normal(0, 1, (3, 32)).astype(np.float32))
        except Exception as e:                       # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    lbl = sb.snapshot().labels
    assert len(sb) == 4 + 4 * 8 * 3
    assert len(np.unique(lbl)) == lbl.size           # no duplicate mints


def test_scan_view_consistent_under_concurrent_growth(rng):
    """The ADVICE torn-read scenario: scans race enrolls that repeatedly
    _grow the capacity. topk_matches_bank must fetch (q, scale, labels)
    as ONE locked view — a torn mixed-capacity triple crashes the scan
    with a shape mismatch."""
    sb, x = _sb(rng, n=8, slab=8)                    # tiny slab → many grows
    stop = threading.Event()
    errs = []

    def mutate():
        r = np.random.default_rng(7)
        try:
            while not stop.is_set():
                sb.enroll(r.normal(0, 1, (5, 32)).astype(np.float32))
        except Exception as e:                       # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=mutate)
    t.start()
    try:
        for _ in range(25):
            s, l = topk_matches_bank(x, sb, k=4)
            assert l.shape == (8, 4)
            assert (l[np.arange(8), 0] == np.arange(8)).all()  # originals win
    finally:
        stop.set()
        t.join()
    assert not errs


def test_device_label_range_guard(rng):
    bank = quantize_bank(rng.normal(0, 1, (2, 8)), [1, 2 ** 31])
    with pytest.raises(ValueError, match="int32"):
        bank.to_device()
    with pytest.raises(ValueError, match="int32"):
        ServingBank.from_bank(bank, slab=8)
    sb, _ = _sb(rng, n=2, dim=8, slab=8)
    with pytest.raises(ValueError, match="int32"):
        sb.enroll(rng.normal(0, 1, (1, 8)).astype(np.float32),
                  labels=[2 ** 31])


# ---------------------------------------------------------------------------
# serve-http mutable gallery
# ---------------------------------------------------------------------------


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _post(url, data=b""):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture()
def mutable_server(rng):
    from crfr.serve_http import make_server

    dim, batch, size = 32, 4, 8
    w = rng.normal(0, 0.05, (size * size * 3, dim)).astype(np.float32)

    def call(x):                                     # stand-in embed fn
        return np.asarray(x, np.float32).reshape(x.shape[0], -1) @ w

    meta = {"batch": batch, "image_size": size, "embedding_dim": dim,
            "input_dtype": "uint8"}
    gal = _embs(rng, 6, dim)
    sb = ServingBank.from_bank(quantize_bank(gal, np.arange(6)), slab=16)
    srv = make_server(call, meta, port=0, bank=sb, window_ms=1.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", sb, gal, call
    srv.shutdown()
    srv.service.close()
    srv.server_close()


def test_http_mutable_lifecycle(mutable_server, rng):
    url, sb, gal, _ = mutable_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["mutable"] and info["gallery"] == 6

    new = _embs(rng, 8, 32)[6:8] + 0.0               # ids 6, 7 axes
    status, body = _post(url + "/enroll", _npy(new))
    assert status == 200, body
    out = json.loads(body)
    assert out == {"enrolled": 2, "labels": [6, 7], "gallery": 8}

    status, body = _post(url + "/match?k=2", _npy(new))
    matches = json.loads(body)["matches"]
    assert status == 200 and matches[0]["labels"][0] == 6
    assert matches[1]["labels"][0] == 7

    status, body = _post(url + "/remove?labels=6")
    assert status == 200 and json.loads(body) == {"removed": 1, "gallery": 7}
    status, body = _post(url + "/match?k=2", _npy(new))
    assert 6 not in json.loads(body)["matches"][0]["labels"]

    with urllib.request.urlopen(url + "/gallery", timeout=30) as r:
        z = np.load(io.BytesIO(r.read()))
    snap = sb.snapshot()
    assert (z["labels"] == snap.labels).all() and (z["q"] == snap.q).all()


def test_http_enroll_pixels_roundtrip(mutable_server, rng):
    """4-d enroll bodies go through the embed service first; matching the
    same pixels finds the enrolled row."""
    url, _, _, call = mutable_server
    px = rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8)
    status, body = _post(url + "/enroll?labels=42", _npy(px))
    assert status == 200 and json.loads(body)["labels"] == [42]
    status, body = _post(url + "/match?k=1", _npy(px))
    assert json.loads(body)["matches"][0]["labels"] == [42]


def test_http_enroll_errors(mutable_server, rng):
    url, *_ = mutable_server
    status, body = _post(url + "/enroll?labels=1,2",
                         _npy(rng.normal(0, 1, (1, 32)).astype(np.float32)))
    assert status == 400 and b"labels" in body
    status, body = _post(url + "/remove")
    assert status == 400 and b"labels" in body


def test_http_static_bank_rejects_mutation(rng):
    from crfr.serve_http import make_server

    bank = quantize_bank(_embs(rng, 4, 16), np.arange(4))
    meta = {"batch": 2, "image_size": 4, "embedding_dim": 16,
            "input_dtype": "uint8"}
    srv = make_server(lambda x: np.zeros((x.shape[0], 16), np.float32),
                      meta, port=0, bank=bank, window_ms=1.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        status, body = _post(url + "/enroll",
                             _npy(np.zeros((1, 16), np.float32)))
        assert status == 400 and b"mutable" in body
        status, body = _post(url + "/remove?labels=1")
        assert status == 400 and b"mutable" in body
    finally:
        srv.shutdown()
        srv.service.close()
        srv.server_close()
