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
        the 6.6 ms scan, would dominate per-request latency."""
        dev = device if device is not None else jax.devices()[0]
        return QuantBank(q=jax.device_put(self.q, dev),
                         scale=jax.device_put(self.scale, dev),
                         labels=jax.device_put(self.labels, dev))


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
