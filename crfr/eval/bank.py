"""int8 embedding banks — quantized gallery storage + scoring for
large-scale identification serving.

Why (TPU-first): the streaming gallery scan (`eval/identification.py
streaming_topk`, SURVEY.md §5.7's "long-context analog") is HBM-bandwidth
bound — per probe block the device reads the whole M×D gallery. Embeddings
are unit-normalized, so per-row symmetric int8 (scale = absmax/127 ≤ 1/127)
represents each coordinate to ~0.4% of its range; cosine-gap between
identities is orders of magnitude larger. Quantizing the bank therefore:

- **4× less HBM traffic** than f32 banks (2× vs bf16) → proportionally
  faster scans of big galleries,
- **4× capacity**: a 16 GB v5e chip holds a ~30M×512 int8 bank resident,
- scores via the MXU's s8×s8→s32 path (`preferred_element_type=int32`),
  rescaled by the per-row scales: ŝ = (q_p·q_g)·s_p·s_g ≈ cosine.

Per-probe ranking is exact in the probe scale (monotone per probe); the
only approximation is the ±½ulp rounding of both operands, pinned by
tests to rank-parity with the float path on clustered embeddings.

The reference family stores float banks and GEMMs them dense (SURVEY.md
§2.1 "Identification eval"); this is a rebuild-side serving extra in the
same spirit as the int8 conv path (`models/quant.py`).

File format: ``.npz`` with arrays ``q`` (M, D) int8, ``scale`` (M,) f32,
``labels`` (M,) int64. Build with ``crfr extract --quantize-bank``;
``crfr match``/``eval-openset`` consume ``.npz`` galleries transparently.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from crfr.eval.identification import _approx_cfg, _block_topk


@dataclass
class QuantBank:
    q: np.ndarray          # (M, D) int8 — normalized embedding rows / scale
    scale: np.ndarray      # (M,) f32 per-row dequant scale
    labels: np.ndarray     # (M,) int64 identity labels (−1 = padding)

    def __len__(self) -> int:
        return int(self.q.shape[0])

    def dequantize(self) -> np.ndarray:
        """→ (M, D) f32 ≈ the normalized embeddings (test golden)."""
        return np.asarray(self.q).astype(np.float32) \
            * np.asarray(self.scale)[:, None]

    def to_device(self, device=None) -> "QuantBank":
        """Device-resident copy (fields become committed jax arrays).

        Serving daemons MUST do this once at startup: every scan API
        accepts host arrays, but a host-resident bank is re-uploaded
        H2D on every call — at 512 MB per 1M rows that transfer, not
        the 6.6 ms scan, would dominate per-request latency.

        NOTE: `jax.device_put` canonicalizes int64→int32 under default
        jax config, so device-resident labels are int32. `_check_label_range`
        rejects labels ≥ 2³¹ up front (silent truncation otherwise);
        host-side APIs (`snapshot`, `load_bank`) restore int64."""
        dev = device if device is not None else jax.devices()[0]
        _check_label_range(self.labels)
        return QuantBank(q=jax.device_put(self.q, dev),
                         scale=jax.device_put(self.scale, dev),
                         labels=jax.device_put(self.labels, dev))


def _check_label_range(labels) -> None:
    """Device residency narrows labels to int32 (x64 disabled by default);
    refuse labels that would silently truncate rather than wrap them."""
    lbl = np.asarray(labels)
    if lbl.size and (int(lbl.max()) >= 2 ** 31 or int(lbl.min()) < -2 ** 31):
        raise ValueError(
            "labels exceed int32 range: device-resident banks store labels "
            "as int32 (jax canonicalizes int64 with x64 disabled); relabel "
            "below 2**31 or keep the bank host-resident")


def quantize_probes(probe_emb) -> tuple[jax.Array, jax.Array]:
    """THE in-graph quantization recipe (normalize rows → absmax/127 scale
    → clipped round): single source shared by the XLA scan and the fused
    Pallas kernel — their bit-identical-scores invariant (and the
    scan==fused parity tests) depends on every path using this exact
    sequence. → (q (N, D) int8, scale (N,) f32)."""
    p = jnp.asarray(probe_emb, jnp.float32)
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True).clip(1e-12)
    ps = jnp.max(jnp.abs(p), axis=-1).clip(1e-12) / 127.0
    pq = jnp.clip(jnp.round(p / ps[:, None]), -127, 127).astype(jnp.int8)
    return pq, ps


def _quantize_rows(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # host-side twin of quantize_probes (bank building works without a
    # device); keep the sequence identical to the jnp version above
    x = np.asarray(x, np.float32)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    scale = np.abs(x).max(axis=-1).clip(1e-12) / 127.0
    q = np.clip(np.round(x / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_bank(emb, labels=None) -> QuantBank:
    """Normalize rows, per-row symmetric int8. ``labels`` default to the
    row index (pure serving bank)."""
    q, scale = _quantize_rows(emb)
    if labels is None:
        labels = np.arange(q.shape[0])
    return QuantBank(q=q, scale=scale,
                     labels=np.asarray(labels, np.int64))


def save_bank(path: str, bank: QuantBank) -> None:
    np.savez(path, q=bank.q, scale=bank.scale, labels=bank.labels)


def load_bank(path: str) -> QuantBank:
    with np.load(path) as z:
        return QuantBank(q=np.asarray(z["q"], np.int8),
                         scale=np.asarray(z["scale"], np.float32),
                         labels=np.asarray(z["labels"], np.int64))


# ---------------------------------------------------------------------------
# Bank lifecycle — enroll/remove without recalibration
# ---------------------------------------------------------------------------
#
# Per-ROW quantization makes lifecycle ops exact: a row's (q, scale) depends
# only on that row, so appending rows is a concatenation of independently
# quantized rows (bitwise what a from-scratch rebuild of the union produces)
# and removing rows never perturbs the remaining ones. A per-TENSOR-scaled
# bank would need a global recalibration on every enroll; this is why the
# format is per-row.


def append_bank(bank: QuantBank, emb, labels=None) -> QuantBank:
    """Enroll rows into a host bank: quantize the new embeddings with the
    standard per-row recipe and concatenate. Bitwise identical to
    ``quantize_bank`` of the concatenated float embeddings (pinned by
    ``tests/test_bank_lifecycle.py``). ``labels`` default to fresh row
    indices past the current max."""
    q, scale = _quantize_rows(emb)
    if labels is None:
        start = int(bank.labels.max(initial=-1)) + 1
        labels = np.arange(start, start + q.shape[0])
    labels = np.asarray(labels, np.int64)
    if labels.shape != (q.shape[0],):
        raise ValueError(f"labels {labels.shape} != rows ({q.shape[0]},)")
    return QuantBank(q=np.concatenate([np.asarray(bank.q), q]),
                     scale=np.concatenate([np.asarray(bank.scale), scale]),
                     labels=np.concatenate([np.asarray(bank.labels), labels]))


def remove_bank(bank: QuantBank, labels) -> QuantBank:
    """Drop every row whose label is in ``labels`` (host bank, compacting).
    Remaining rows are untouched — per-row scales need no recalibration."""
    rm = np.unique(np.asarray(labels, np.int64))
    keep = ~np.isin(np.asarray(bank.labels), rm)
    return QuantBank(q=np.asarray(bank.q)[keep],
                     scale=np.asarray(bank.scale)[keep],
                     labels=np.asarray(bank.labels)[keep])


def _pow2_bucket(n: int, floor: int = 8) -> int:
    return 1 << max(floor.bit_length() - 1, (n - 1).bit_length())


@partial(jax.jit, static_argnames=())
def _write_rows_jit(q, sc, lbl, rows, rsc, rlbl, start):
    """Write a row block at a TRACED offset — one compiled program per
    (capacity, block-bucket) pair serves every enroll at any offset.
    NOT donated: concurrent scan threads may still hold the old arrays
    (donation would delete their buffers under them); enrolls pay one
    O(capacity) copy, which is the right trade at serving mutation rates."""
    return (jax.lax.dynamic_update_slice(q, rows, (start, 0)),
            jax.lax.dynamic_update_slice(sc, rsc, (start,)),
            jax.lax.dynamic_update_slice(lbl, rlbl, (start,)))


@jax.jit
def _kill_rows_jit(sc, lbl, rm):
    """Tombstone every LIVE row whose label is in ``rm`` (scale→0,
    label→−1 — the scan's existing padding mask). ``rm`` is pow2-padded
    with −1; the ``lbl >= 0`` guard keeps pads/prior tombstones out of
    the returned newly-killed count."""
    dead = (lbl[:, None] == rm[None, :]).any(axis=1) & (lbl >= 0)
    return (jnp.where(dead, jnp.float32(0), sc),
            jnp.where(dead, -1, lbl).astype(lbl.dtype),
            dead.sum())


class ServingBank:
    """Capacity-padded device-resident bank with ONLINE enroll/remove.

    TPU serving reality: the scan programs are compiled for a static bank
    shape, so a naive "append a row" changes M and recompiles every
    matcher (seconds on the tunnel). This class pre-pads the bank to a
    slab-rounded ``capacity``; empty slots carry scale 0 / label −1 —
    exactly the padding convention every scan path already masks to −inf —
    so the SAME compiled scan keeps serving across mutations:

    - ``enroll``: rows are pow2-bucketed and written with one jitted
      ``dynamic_update_slice`` at a traced offset → a handful of compiled
      programs total, none per-request. Bucket pad rows land dead (label
      −1) in the free region and are overwritten by the next enroll.
    - ``remove``: labels are tombstoned in place (no compaction — order
      and capacity are stable, the mask hides them).
    - Scans cost O(capacity) not O(live); slab rounding bounds the waste.
    - Mutations build NEW device arrays (no donation) under a lock;
      concurrent match threads keep whatever consistent snapshot they
      fetched — no deleted-buffer hazard, at one transient capacity-sized
      copy per mutation.

    Duck-types ``QuantBank`` (``.q/.scale/.labels/__len__``) so
    ``topk_matches_bank`` and the HTTP daemon work unchanged; ``__len__``
    reports LIVE rows.
    """

    SLAB = 65536

    def __init__(self, q, scale, labels, size: int, device=None):
        import threading

        self._lock = threading.RLock()
        self._dev = device if device is not None else jax.devices()[0]
        self._slab = self.SLAB
        _check_label_range(labels)
        # host-tracked max live label: auto-label enrolls read it under
        # the mutation lock (no per-enroll D2H of the whole label array,
        # no race between label minting and the write)
        self._max_label = int(np.asarray(labels).max(initial=-1))
        self.q = jax.device_put(q, self._dev)
        self.scale = jax.device_put(scale, self._dev)
        self.labels = jax.device_put(labels, self._dev)
        self.size = int(size)          # high-water mark (incl. tombstones)
        self._dead = 0                 # tombstoned rows below the mark

    # -- construction ---------------------------------------------------
    @classmethod
    def from_bank(cls, bank: QuantBank, capacity: int = 0, slab: int = 0,
                  device=None) -> "ServingBank":
        """Wrap a host ``QuantBank``, padding to ``capacity`` (rounded up
        to whole slabs; default one spare slab past the current rows)."""
        slab = int(slab) or cls.SLAB
        m, d = np.asarray(bank.q).shape
        cap = max(int(capacity), m + 1)
        cap = -(-cap // slab) * slab
        q = np.zeros((cap, d), np.int8)
        sc = np.zeros(cap, np.float32)
        lbl = np.full(cap, -1, np.int64)
        q[:m], sc[:m], lbl[:m] = bank.q, bank.scale, bank.labels
        sb = cls(q, sc, lbl, size=m, device=device)
        sb._slab = slab
        return sb

    # -- introspection ----------------------------------------------------
    def __len__(self) -> int:
        return self.size - self._dead

    @property
    def capacity(self) -> int:
        return int(self.q.shape[0])

    def snapshot(self) -> QuantBank:
        """Compacted host copy (live rows only, original order) — what
        ``save_bank`` persists. Labels are widened back to int64
        (device residency narrows them to int32; see
        ``QuantBank.to_device``) so the host-bank contract holds."""
        with self._lock:
            q, sc, lbl = (np.asarray(self.q), np.asarray(self.scale),
                          np.asarray(self.labels))
        keep = lbl >= 0
        return QuantBank(q=q[keep], scale=sc[keep],
                         labels=lbl[keep].astype(np.int64))

    # -- mutation ---------------------------------------------------------
    def enroll(self, emb, labels=None) -> np.ndarray:
        """Quantize + write new rows; returns the (n,) int64 labels
        actually assigned (the live count is ``len(bank)``). Grows
        (rebuild + natural scan recompile) only when a slab fills.
        Auto-labels (``labels=None``) are minted from the host-tracked
        max under the SAME lock as the write, so concurrent auto-label
        enrolls can never mint duplicates."""
        rows, rsc = _quantize_rows(emb)
        n = rows.shape[0]
        if labels is not None:
            rlbl = np.asarray(labels, np.int64)
            if rlbl.shape != (n,):
                raise ValueError(f"labels {rlbl.shape} != rows ({n},)")
            _check_label_range(rlbl)
        with self._lock:
            if labels is None:
                start_lbl = self._max_label + 1
                rlbl = np.arange(start_lbl, start_lbl + n, dtype=np.int64)
                _check_label_range(rlbl)
            self._max_label = max(self._max_label,
                                  int(rlbl.max(initial=-1)))
            b = _pow2_bucket(n)
            pad = b - n
            if pad:
                rows = np.concatenate([rows, np.zeros((pad, rows.shape[1]),
                                                      np.int8)])
                rsc = np.concatenate([rsc, np.zeros(pad, np.float32)])
                rlbl = np.concatenate([rlbl, np.full(pad, -1, np.int64)])
            if self.size + b > self.capacity:
                self._grow(self.size + b)
            self.q, self.scale, self.labels = _write_rows_jit(
                self.q, self.scale, self.labels, rows, rsc, rlbl,
                jnp.int32(self.size))
            self.size += n
            return rlbl[:n].copy()

    def remove(self, labels) -> int:
        """Tombstone rows by label (in place, no recompile); returns the
        number of rows removed."""
        rm = np.unique(np.asarray(labels, np.int64))
        rm = rm[rm >= 0]                       # −1 is the tombstone marker
        if rm.size == 0:
            return 0
        b = _pow2_bucket(rm.shape[0])
        if b != rm.shape[0]:
            rm = np.concatenate([rm, np.full(b - rm.shape[0], -1, np.int64)])
        with self._lock:
            self.scale, self.labels, killed = _kill_rows_jit(
                self.scale, self.labels, jnp.asarray(rm))
            removed = int(killed)
            self._dead += removed
            return removed

    def view(self) -> QuantBank:
        """Consistent (q, scale, labels) snapshot for scans: mutations
        replace all three fields together under the lock, so a match
        thread must fetch them together too (``topk_matches_bank`` calls
        this automatically). The returned arrays are the live device
        buffers — immutable, never donated — so the view stays valid
        even if a mutation lands right after."""
        with self._lock:
            return QuantBank(q=self.q, scale=self.scale, labels=self.labels)

    def _grow(self, need: int) -> None:
        slab = getattr(self, "_slab", self.SLAB)
        cap = -(-max(need, self.capacity + 1) // slab) * slab
        q = np.zeros((cap, self.q.shape[1]), np.int8)
        sc = np.zeros(cap, np.float32)
        lbl = np.full(cap, -1, np.int64)
        m = self.size
        q[:m] = np.asarray(self.q)[:m]
        sc[:m] = np.asarray(self.scale)[:m]
        lbl[:m] = np.asarray(self.labels)[:m]
        self.q = jax.device_put(q, self._dev)
        self.scale = jax.device_put(sc, self._dev)
        self.labels = jax.device_put(lbl, self._dev)


# ---------------------------------------------------------------------------
# Quantized streaming / sharded top-k (mirrors identification.streaming_topk)
# ---------------------------------------------------------------------------


def streaming_topk_q(probe_emb, q, scale, labels, k: int = 10,
                     block: int = 8192, approx: bool | float = False):
    """Per-probe top-k against an int8 bank without materializing (N, M).

    Probes are normalized and row-quantized in-graph; each lax.scan block
    does an s8×s8→s32 MXU GEMM then one rescale multiply. Padding rows get
    scale 0 / label −1 and score −inf.

    ``approx`` (bool | float): TPU-native binned ``lax.approx_max_k``
    block selection — 1.9× faster per 1M-row scan on v5e (15.4 → 8.2 ms,
    256 probes, k=10) at recall@10 ≈ 0.998 / structurally exact top-1; a
    float sets the recall_target (``identification._approx_cfg``
    documents the adversarial stride-aliasing case and why 0.999 defeats
    it). Selected rows keep their exact quantized scores."""
    pq, ps = quantize_probes(probe_emb)

    q = jnp.asarray(q)
    m = q.shape[0]
    nblocks = max(-(-m // block), 1)
    pad = nblocks * block - m
    q = jnp.pad(q, ((0, pad), (0, 0)))
    sc = jnp.pad(jnp.asarray(scale, jnp.float32), (0, pad))
    lbl = jnp.pad(jnp.asarray(labels), (0, pad), constant_values=-1)
    qb = q.reshape(nblocks, block, -1)
    sb = sc.reshape(nblocks, block)
    lb = lbl.reshape(nblocks, block)

    n = pq.shape[0]
    init = (jnp.full((n, k), -jnp.inf, jnp.float32),
            jnp.full((n, k), -1, lbl.dtype))
    use_approx, recall_target = _approx_cfg(approx)

    def step(carry, xs):
        top_s, top_l = carry
        qblk, sblk, lblk = xs
        acc = jax.lax.dot_general(
            pq, qblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                  # (N, block)
        sim = acc.astype(jnp.float32) * (ps[:, None] * sblk[None, :])
        sim = jnp.where(lblk[None, :] >= 0, sim, -jnp.inf)
        if use_approx and sim.shape[1] > k:
            blk_s, bi = jax.lax.approx_max_k(sim, k,
                                             recall_target=recall_target)
            blk_l = lblk[bi]
        else:
            blk_s, blk_l = _block_topk(sim, lblk, k)
        cat_s = jnp.concatenate([top_s, blk_s], axis=1)        # (N, 2k)
        cat_l = jnp.concatenate([top_l, blk_l], axis=1)
        new_s, idx = jax.lax.top_k(cat_s, k)
        new_l = jnp.take_along_axis(cat_l, idx, axis=1)
        return (new_s, new_l), None

    (scores, out_labels), _ = jax.lax.scan(step, init, (qb, sb, lb))
    return scores, out_labels


@partial(jax.jit, static_argnames=("k", "block", "approx"))
def _streaming_topk_q_jit(pq, q, sc, lbl, k: int, block: int,
                          approx: bool | float = False):
    return streaming_topk_q(pq, q, sc, lbl, k=k, block=block, approx=approx)


@lru_cache(maxsize=64)
def _sharded_topk_q_jit(mesh: Mesh, k: int, block: int,
                        approx: bool | float):
    """Cached jitted sharded quantized scan (same rationale as
    identification._sharded_topk_jit: a fresh shard_map closure per call
    would recompile the identical program every time)."""
    return jax.jit(sharded_topk_q(mesh, k=k, block=block, approx=approx))


def sharded_topk_q(mesh: Mesh, k: int = 10, block: int = 8192,
                   approx: bool | float = False):
    """Mesh-sharded quantized scan: bank rows sharded over the whole mesh,
    probes replicated; per-shard streaming top-k then a k·n_shards merge
    (identical reduction to identification.sharded_topk)."""
    axes = tuple(mesh.axis_names)

    def body(p, q, sc, lbl):
        s, l = streaming_topk_q(p, q, sc, lbl, k=k, block=block,
                                approx=approx)
        all_s, all_l = s, l
        for ax in axes:
            all_s = jax.lax.all_gather(all_s, ax, axis=1, tiled=True)
            all_l = jax.lax.all_gather(all_l, ax, axis=1, tiled=True)
        top_s, idx = jax.lax.top_k(all_s, k)
        top_l = jnp.take_along_axis(all_l, idx, axis=1)
        return top_s, top_l

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes), P(axes)),
        out_specs=(P(), P()),
        check_rep=False,
    )


def topk_matches_bank(probe_emb, bank: QuantBank, k: int,
                      block: int = 0, mesh: Mesh | None = None,
                      fused: bool = False, approx: bool | float = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Quantized-bank twin of ``identification.topk_matches`` — same
    dispatch (streaming single-device / row-sharded on a >1-device mesh),
    same (scores, labels) contract. ``block <= 0`` auto-sizes.

    ``fused=True`` routes single-device scans through the Pallas 3-phase
    kernel (``ops/bank_scan.py``). It is bit-identical to the scan but
    NOT the default: on the current v5e/libtpu stack its HBM→VMEM DMA
    pipeline measured ~33–60 GB/s (both auto-BlockSpec and manual
    double-buffered variants) vs the XLA scan's effective ~190 GB/s bank
    read, so the scan wins (13.5 ms vs 18.0 ms per 1M×512 scan, 256
    probes, interleaved A/B on a quiet host). Revisit when the Mosaic DMA
    pipeline improves."""
    from crfr.eval.identification import _auto_block

    view = getattr(bank, "view", None)
    if callable(view):
        # ServingBank: fetch (q, scale, labels) as ONE locked snapshot —
        # three separate attribute reads could straddle a concurrent
        # enroll's _grow and observe a torn mixed-capacity triple
        bank = view()
    q = jnp.asarray(bank.q)
    sc = jnp.asarray(bank.scale)
    lbl = jnp.asarray(bank.labels)
    block = _auto_block(block, int(jnp.shape(probe_emb)[0]))
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if n_dev <= 1 and fused:
        tile = 128
        if int(q.shape[0]) >= tile * k:
            from crfr.ops.bank_scan import bank_topk_fused
            n = int(jnp.shape(probe_emb)[0])
            # keep the (N, chunk) f32 sim block within VMEM at large N;
            # chunk/tile must stay sublane-aligned (≥8)
            chunk = 2048 if n <= 512 else 1024
            s, l = bank_topk_fused(probe_emb, q, sc, lbl, k=k, tile=tile,
                                   chunk=chunk)
            return np.asarray(s), np.asarray(l)
    if mesh is not None and n_dev > 1:
        m = q.shape[0]
        padm = -(-m // n_dev) * n_dev
        if padm != m:
            q = jnp.pad(q, ((0, padm - m), (0, 0)))
            sc = jnp.pad(sc, (0, padm - m))
            lbl = jnp.pad(lbl, (0, padm - m), constant_values=-1)
        fn = _sharded_topk_q_jit(mesh, k, min(block, padm // n_dev), approx)
        s, l = fn(jnp.asarray(probe_emb), q, sc, lbl)
    else:
        s, l = _streaming_topk_q_jit(jnp.asarray(probe_emb), q, sc, lbl, k,
                                     min(block, max(int(q.shape[0]), 1)),
                                     approx)
    return np.asarray(s), np.asarray(l)
