"""HTTP serving daemon — production inference on AOT embed artifacts.

`crfr serve-http --artifact model.crfrx [--gallery-npz bank.npz]` serves:

- ``GET  /healthz``      → JSON: artifact meta + gallery size.
- ``POST /embed``        → body: ``.npy`` bytes, (B', S, S, 3) uint8/f32
                           raw pixels; response: ``.npy`` bytes (B', D)
                           f32 embeddings. Any B' — requests are
                           coalesced into the artifact's static batch.
- ``POST /match?k=5``    → body: ``.npy`` probes — raw pixels (4-d, get
                           embedded first) or embeddings (2-d); response:
                           JSON top-k labels+scores per probe against the
                           loaded int8 QuantBank (``eval/bank.py``).

With ``--mutable-gallery`` the bank is a capacity-padded ``ServingBank``
(online lifecycle, no per-mutation scan recompiles) and three more
endpoints activate:

- ``POST /enroll[?labels=7,8]`` → body: ``.npy`` pixels (4-d) or
                           embeddings (2-d); rows are row-quantized and
                           written in place; labels auto-mint past the
                           current max when omitted. Response: JSON
                           ``{enrolled, labels, gallery}``.
- ``POST /remove?labels=3,4`` → tombstone rows by label (scale→0,
                           label→−1 — the scan's padding mask); response
                           JSON ``{removed, gallery}``.
- ``GET  /gallery``      → compacted ``.npz`` snapshot bytes (what
                           ``save_bank`` persists) — enroll online, then
                           fetch the bank for durable storage.

Design notes (TPU serving realities the stack is built around):

- The artifact's compiled program has ONE static batch size (XLA static
  shapes). ``EmbedService`` owns a single worker thread that drains a
  queue of pending requests, concatenates them, pads to the static
  batch, runs, and scatters results back — so concurrent small requests
  share device dispatches instead of serializing ``B=256`` programs per
  single image. ``window_ms`` bounds added latency.
- stdlib-only (ThreadingHTTPServer): zero new dependencies, runs
  anywhere the export runs; numpy ``.npy`` is the wire format (exact
  dtypes, zero parsing ambiguity).
- The reference family has no serving story (SURVEY.md §2: research
  train/eval scripts only); this subsystem is rebuild-side.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable
from urllib.parse import parse_qs, urlparse

import numpy as np


class EmbedService:
    """Coalescing batcher around a fixed-batch embed callable.

    ``fn``: (B, S, S, 3) → (B, D); ``batch``: the static B. ``submit``
    is thread-safe and returns that request's rows when its batch has
    run. Oversized requests are chunked internally.
    """

    def __init__(self, fn: Callable, batch: int, window_ms: float = 2.0):
        self.fn = fn
        self.batch = int(batch)
        self.window_s = float(window_ms) / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.dispatches = 0                      # device programs run
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side --------------------------------------------------
    def submit(self, images: np.ndarray) -> np.ndarray:
        images = np.ascontiguousarray(images)
        done = threading.Event()
        slot: dict = {}
        self._q.put((images, slot, done))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=5)

    # -- worker side --------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                continue
            batch_items = [item]
            rows = item[0].shape[0]
            # coalesce: whatever arrives within ONE window of the first
            # request, up to B rows — the deadline is absolute, so a steady
            # trickle cannot extend a request's wait past window_ms
            t_end = time.monotonic() + self.window_s
            while rows < self.batch:
                left = t_end - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch_items.append(nxt)
                rows += nxt[0].shape[0]
            try:
                x = np.concatenate([it[0] for it in batch_items], axis=0)
                outs = []
                for s in range(0, len(x), self.batch):
                    chunk = x[s:s + self.batch]
                    pad = self.batch - len(chunk)
                    if pad:
                        chunk = np.concatenate(
                            [chunk, np.zeros((pad,) + chunk.shape[1:],
                                             chunk.dtype)])
                    outs.append(np.asarray(self.fn(chunk))[:self.batch - pad
                                                           or None])
                    self.dispatches += 1
                y = np.concatenate(outs, axis=0)
                off = 0
                for arr, slot, done in batch_items:
                    slot["result"] = y[off:off + arr.shape[0]]
                    off += arr.shape[0]
                    done.set()
            except Exception as e:                       # noqa: BLE001
                for _, slot, done in batch_items:
                    slot["error"] = e
                    done.set()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _load_npy(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


def make_server(fn: Callable, meta: dict, host: str = "127.0.0.1",
                port: int = 0, bank=None, window_ms: float = 2.0,
                default_k: int = 5) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. ``fn``/``meta`` from
    ``serve.load_embed``; ``bank`` an ``eval.bank.QuantBank`` or None.
    Returns the server; ``server.service`` is the EmbedService (close it
    on shutdown); ``server.server_address`` has the bound port."""
    service = EmbedService(fn, batch=int(meta.get("batch", 256)),
                           window_ms=window_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):               # quiet by default
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _fail(self, code: int, msg: str):
            self._send(code, json.dumps({"error": msg}).encode())

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/gallery":
                if bank is None:
                    return self._fail(400, "no gallery bank loaded")
                from crfr.eval.bank import QuantBank
                snap = (bank.snapshot() if hasattr(bank, "snapshot")
                        else QuantBank(q=np.asarray(bank.q),
                                       scale=np.asarray(bank.scale),
                                       labels=np.asarray(bank.labels,
                                                         np.int64)))
                buf = io.BytesIO()
                np.savez(buf, q=snap.q, scale=snap.scale, labels=snap.labels)
                return self._send(200, buf.getvalue(),
                                  "application/octet-stream")
            if path != "/healthz":
                return self._fail(404, "unknown path")
            info = {"ok": True, "meta": meta,
                    "gallery": (len(bank) if bank is not None else 0),
                    "mutable": hasattr(bank, "enroll"),
                    "dispatches": service.dispatches}
            self._send(200, json.dumps(info).encode())

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def _parse_labels(self, qs) -> np.ndarray | None:
            raw = qs.get("labels", [""])[0]
            if not raw:
                return None
            return np.asarray([int(v) for v in raw.split(",") if v],
                              np.int64)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path == "/remove":
                # no .npy body — labels come from the query string
                if not hasattr(bank, "remove"):
                    return self._fail(400, "gallery is not mutable "
                                           "(start with --mutable-gallery)")
                self._body()                     # drain any body bytes
                try:
                    rm = self._parse_labels(parse_qs(parsed.query))
                    if rm is None or rm.size == 0:
                        return self._fail(400, "need ?labels=1,2,...")
                    removed = bank.remove(rm)
                except Exception as e:           # noqa: BLE001
                    return self._fail(500, str(e))
                return self._send(200, json.dumps(
                    {"removed": removed, "gallery": len(bank)}).encode())
            try:
                arr = _load_npy(self._body())
            except Exception as e:               # noqa: BLE001
                return self._fail(400, f"body must be .npy bytes: {e}")
            if parsed.path == "/enroll":
                if not hasattr(bank, "enroll"):
                    return self._fail(400, "gallery is not mutable "
                                           "(start with --mutable-gallery)")
                qs = parse_qs(parsed.query)
                try:
                    labels = self._parse_labels(qs)
                    if arr.ndim == 4:            # raw pixels → embed first
                        want = np.dtype(meta.get("input_dtype", "uint8"))
                        arr = service.submit(arr.astype(want, copy=False))
                    if arr.ndim != 2:
                        return self._fail(400, f"bad rows shape {arr.shape}")
                    if labels is not None and labels.shape[0] != arr.shape[0]:
                        return self._fail(400, f"{labels.shape[0]} labels "
                                               f"for {arr.shape[0]} rows")
                    got = bank.enroll(np.asarray(arr, np.float32),
                                      labels=labels)
                except Exception as e:           # noqa: BLE001
                    return self._fail(500, str(e))
                return self._send(200, json.dumps(
                    {"enrolled": int(arr.shape[0]),
                     "labels": [int(v) for v in got],
                     "gallery": len(bank)}).encode())
            if parsed.path == "/embed":
                want_s = int(meta.get("image_size", 0))
                if arr.ndim != 4 or (want_s and
                                     arr.shape[1:] != (want_s, want_s, 3)):
                    # reject BEFORE submit: a wrong-shape request inside a
                    # coalesced batch would fail every request in it
                    return self._fail(400,
                                      f"expect (B, {want_s}, {want_s}, 3), "
                                      f"got {arr.shape}")
                try:
                    # the AOT program's input dtype is static — coerce so
                    # mixed-dtype clients can't poison a coalesced batch
                    want = np.dtype(meta.get("input_dtype", "uint8"))
                    emb = service.submit(arr.astype(want, copy=False))
                except Exception as e:           # noqa: BLE001
                    return self._fail(500, str(e))
                return self._send(200, _npy_bytes(np.asarray(emb)),
                                  "application/octet-stream")
            if parsed.path == "/match":
                if bank is None:
                    return self._fail(400, "no gallery bank loaded "
                                           "(start with --gallery-npz)")
                qs = parse_qs(parsed.query)
                k = int(qs.get("k", [default_k])[0])
                approx = qs.get("approx", ["0"])[0] not in ("0", "", "false")
                # ?recall=0.999 sets the approx_max_k recall_target
                # (implies approx; see identification._approx_cfg)
                rq = qs.get("recall", [""])[0]
                if rq:
                    try:
                        approx = float(rq)
                    except ValueError:
                        return self._fail(400, f"bad recall {rq!r}")
                try:
                    if arr.ndim == 4:            # raw pixels → embed first
                        want_s = int(meta.get("image_size", 0))
                        if want_s and arr.shape[1:] != (want_s, want_s, 3):
                            return self._fail(
                                400, f"expect (B, {want_s}, {want_s}, 3) "
                                     f"pixels, got {arr.shape}")
                        want = np.dtype(meta.get("input_dtype", "uint8"))
                        arr = service.submit(arr.astype(want, copy=False))
                    if arr.ndim != 2:
                        return self._fail(400, f"bad probe shape {arr.shape}")
                    from crfr.eval.bank import topk_matches_bank
                    # bucket (N, k) to powers of two (N≥32, k≥16): XLA
                    # programs are static-shaped, so every novel probe
                    # count would otherwise JIT a fresh scan per request
                    p = np.asarray(arr, np.float32)
                    n = p.shape[0]
                    nb = 1 << max(5, (n - 1).bit_length())
                    kb = 1 << max(4, (k - 1).bit_length())
                    if nb != n:
                        p = np.pad(p, ((0, nb - n), (0, 0)))
                    scores, labels = topk_matches_bank(
                        p, bank, k=kb, approx=approx)
                    scores, labels = scores[:n, :k], labels[:n, :k]
                except Exception as e:           # noqa: BLE001
                    return self._fail(500, str(e))
                out = {"k": k, "gallery": len(bank),
                       "matches": [{"labels": labels[i].tolist(),
                                    "scores": [round(float(s), 4)
                                               for s in scores[i]]}
                                   for i in range(len(labels))]}
                return self._send(200, json.dumps(out).encode())
            return self._fail(404, "unknown path")

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.service = service                        # type: ignore[attr-defined]
    return srv


def serve_artifact(artifact: str, gallery_npz: str = "",
                   host: str = "127.0.0.1", port: int = 0,
                   window_ms: float = 2.0, mutable: bool = False,
                   slab: int = 0) -> ThreadingHTTPServer:
    """Load an AOT artifact (+ optional bank) and return a ready server.

    ``mutable=True`` wraps the gallery in a capacity-padded
    ``ServingBank`` (online /enroll and /remove without per-mutation
    scan recompiles); without a ``gallery_npz`` it starts empty at the
    artifact's embedding dim. ``slab`` overrides the capacity-rounding
    slab (ServingBank.SLAB=65536 default — small daemons can shrink it)."""
    from crfr.serve import load_embed

    fn = load_embed(artifact)
    bank = None
    if gallery_npz:
        from crfr.eval.bank import load_bank
        host_bank = load_bank(gallery_npz)
        if mutable:
            from crfr.eval.bank import ServingBank
            bank = ServingBank.from_bank(host_bank, slab=slab)
        else:
            # device-resident: a host bank would re-upload H2D per request
            bank = host_bank.to_device()
    elif mutable:
        import numpy as _np
        from crfr.eval.bank import QuantBank, ServingBank
        d = int(fn.meta.get("embedding_dim", 512))
        empty = QuantBank(q=_np.zeros((0, d), _np.int8),
                          scale=_np.zeros(0, _np.float32),
                          labels=_np.zeros(0, _np.int64))
        bank = ServingBank.from_bank(empty, slab=slab)
    return make_server(fn, fn.meta, host=host, port=port, bank=bank,
                       window_ms=window_ms)
