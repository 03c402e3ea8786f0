"""Fused Pallas gallery-scan kernel — an exact 3-phase bank top-k that
reads the bank once from HBM.

Motivation: the XLA block-scan in ``eval/bank.py`` materializes the
(N, B) f32 similarity block and re-reads it for selection; in principle a
fused score + rescale + mask + tile-max in VMEM saves those round trips
(only (N, M/tile) maxima leave the kernel, ~tile× smaller).

Exact top-k in three phases (the tournament argument — see
``eval/identification.py::_block_topk``: a tile whose max is below the
k-th global value cannot hold a top-k element, and fewer than k tiles can
beat a tile containing one):

1. kernel: per-(probe, gallery-tile) maxima, one pass over the bank;
2. ``lax.top_k`` over the (M/tile, N) maxima → k candidate tiles/probe;
3. gather those k·tile rows per probe, RE-score with the identical
   dot + rescale (bit-identical to phase 1 by construction), one small
   sort of k·tile candidates.

STATUS — correct but not the default path. Verified bit-identical to the
XLA scan (1M×512 real-chip check), but on the current v5e/libtpu stack
every Pallas DMA strategy tried (auto-pipelined BlockSpec grid, manual
double-buffered ``make_async_copy``, chunk 2k–8k, int8 and bf16) topped
out at ~33–60 GB/s HBM→VMEM — a DMA-only kernel with no compute costs
the same — while XLA's own pipeline reads the bank at ~190 GB/s
(effective end-to-end: scan 13.5 ms vs fused 18.0 ms per 1M×512 scan,
256 probes, interleaved A/B, quiet host). ``topk_matches_bank`` therefore
defaults to the XLA scan; pass ``fused=True`` to use this kernel.
Revisit when the Mosaic DMA pipeline improves.

The in-kernel dot casts int8→bf16: MXU bf16 products are exact in the
f32 accumulator and |Σ| ≤ 512·127² < 2²³, so results equal the s8×s8→s32
path bit-for-bit at full bf16 MXU rate.

No reference counterpart (SURVEY.md §2.1 runs dense GEMMs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = jnp.float32(-3.0e38)          # effectively −inf, stays finite in f32


def _tilemax_kernel(tile: int, pq_ref, q_ref, sc_ref, bias_ref, out_ref):
    # int8→bf16 cast: exact (see module docstring) and runs the MXU at
    # full bf16 rate — measured faster than Mosaic's int8 dot lowering.
    acc = jax.lax.dot_general(
        pq_ref[:].astype(jnp.bfloat16), q_ref[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (N, G)
    sim = acc * sc_ref[:] + bias_ref[:]                      # (1, G) bcast
    n, g = sim.shape
    # output transposed (tiles, N): the Pallas TPU lowering needs the
    # block's last dim 128-divisible or full — N is the full dim.
    out_ref[:] = jnp.max(sim.reshape(n, g // tile, tile), axis=2).T


@partial(jax.jit, static_argnames=("tile", "chunk", "interpret"))
def bank_tilemax(pq: jax.Array, q: jax.Array, scale: jax.Array,
                 valid: jax.Array, tile: int = 128, chunk: int = 2048,
                 interpret: bool = False) -> jax.Array:
    """(M/tile, N) per-probe gallery-tile score maxima in ONE bank pass
    (transposed layout — see ``_tilemax_kernel``).

    ``pq`` (N, D) int8 quantized probes (N a multiple of 32, caller pads),
    ``q`` (M, D) int8 bank (M a multiple of ``chunk``, caller pads),
    ``scale`` (M,) f32 combined dequant scales, ``valid`` (M,) bool.
    Invalid/padding rows score −3e38.
    """
    n, _ = pq.shape
    m = q.shape[0]
    sc = jnp.asarray(scale, jnp.float32).reshape(1, m)
    bias = jnp.where(jnp.asarray(valid).reshape(1, m), jnp.float32(0), _NEG)
    grid = m // chunk
    return pl.pallas_call(
        partial(_tilemax_kernel, tile),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, pq.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, q.shape[1]), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // tile, n), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m // tile, n), jnp.float32),
        interpret=interpret,
    )(pq, q, sc, bias)


def _quantize_probes(probe_emb):
    # single-source recipe: phase-1/phase-3 score equality with the XLA
    # scan requires the exact same quantization sequence
    from crfr.eval.bank import quantize_probes

    return quantize_probes(probe_emb)


@partial(jax.jit, static_argnames=("k", "tile", "chunk", "interpret"))
def bank_topk_fused(probe_emb, q, scale, labels, k: int = 10,
                    tile: int = 128, chunk: int = 2048,
                    interpret: bool = False):
    """Exact per-probe top-k against an int8 bank via the fused kernel.

    Same contract as ``eval.bank.streaming_topk_q``: (scores (N, k),
    labels (N, k)) sorted desc, label −1 + score −inf for sub-k rows.
    Caller guarantees M ≥ tile·k (``topk_matches_bank`` dispatches small
    banks to the scan path).
    """
    pq, ps = _quantize_probes(probe_emb)
    n = pq.shape[0]
    npad = -n % 32                              # int8 sublane multiple
    if npad:
        pq = jnp.pad(pq, ((0, npad), (0, 0)))
        ps = jnp.pad(ps, (0, npad))

    q = jnp.asarray(q)
    m = q.shape[0]
    mpad = -m % chunk
    if mpad:
        q = jnp.pad(q, ((0, mpad), (0, 0)))
    sc = jnp.pad(jnp.asarray(scale, jnp.float32), (0, mpad))
    lbl = jnp.pad(jnp.asarray(labels), (0, mpad), constant_values=-1)
    valid = lbl >= 0

    # Phase 1: one fused pass over the bank.
    tm = bank_tilemax(pq, q, sc, valid, tile=tile, chunk=chunk,
                      interpret=interpret)                  # (T, N')
    # Phase 2: k candidate tiles per probe (small sort over T maxima).
    _, tsel = jax.lax.top_k(tm.T, k)                        # (N', k)
    # Phase 3: gather candidate rows, re-score identically, final sort.
    cand = (tsel[:, :, None] * tile
            + jnp.arange(tile)[None, None, :]).reshape(pq.shape[0], k * tile)
    rows = jnp.take(q, cand, axis=0)                        # (N', k·t, D)
    acc = jax.lax.dot_general(
        pq[:, None, :], rows, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0, :]          # (N', k·t)
    sim = acc.astype(jnp.float32) * (ps[:, None] * jnp.take(sc, cand))
    sim = jnp.where(jnp.take(valid, cand), sim, -jnp.inf)
    cl = jnp.take(lbl, cand)
    s, idx = jax.lax.top_k(sim, k)
    l = jnp.take_along_axis(cl, idx, axis=1)
    l = jnp.where(jnp.isfinite(s), l, -1)
    if npad:
        s, l = s[:n], l[:n]
    return s, l
