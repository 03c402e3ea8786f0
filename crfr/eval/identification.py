"""Identification evaluation — closed-set rank-k/CMC and open-set TPIR@FPIR.

Implements SURVEY.md §2.1 "Identification eval" / §3.4 and BASELINE configs
2–3: SCface d1/d2/d3 LR probes vs HR mugshot gallery (closed set, rank-1 and
CMC) and TinyFace / QMUL-SurvFace open-set identification (rank-1/5/10/20
CMC over the distractor-augmented gallery, TPIR@FPIR).

TPU-first design (SURVEY.md §5.7 — the "long-context analog" of this
workload): the probe×gallery cosine similarity S = P̂·Ĝᵀ is a pure GEMM,
and the PRODUCTION path never materializes it. Every entry point
(``closed_set_identification`` / ``open_set_identification`` and the IJB-C
1:N stack built on them) routes through ``topk_matches``:

- single device: ``streaming_topk`` — a ``lax.scan`` over static gallery
  blocks keeping a running per-probe top-k (flash-attention-style blockwise
  reduction). Peak live memory is O(N·(k+block)), independent of gallery
  size.
- >1-device mesh: ``sharded_topk`` — the same streaming body under
  ``shard_map`` with the GALLERY axis sharded over the mesh; each device
  scans its gallery shard, then the per-shard top-k candidates are
  all-gathered (k·mesh entries per probe, tiny — rides ICI) and reduced.

Rank/CMC from top-k candidates is exact: no correct-identity entry can
outscore the best correct entry, so the first correct-label position in the
score-sorted candidate list equals the count of wrong-identity entries above
the best correct one (the classical definition), for any k ≥ max_rank.

Gallery labels are non-negative by convention; label −1 marks padding rows
(masked out of every top-k).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


@dataclass
class IdentificationResult:
    rank1: float
    cmc: np.ndarray                       # (max_rank,) cumulative match curve
    tpir_at_fpir: dict[float, float]      # open-set only; {} for closed set


def _normalized(x):
    x = x.astype(jnp.float32)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


# ---------------------------------------------------------------------------
# Streaming / sharded top-k — the production similarity engine
# ---------------------------------------------------------------------------


def _block_topk(sim: jax.Array, lblk: jax.Array, k: int, tile: int = 128
                ) -> tuple[jax.Array, jax.Array]:
    """EXACT top-k of one (N, B) score block — hierarchical, sort-light.

    ``lax.top_k`` full-sorts the row; on TPU that dominates the whole
    gallery scan (measured: sort ≫ the block GEMM). Instead: tile the row
    (B = T·tile), take per-tile maxima (cheap VPU reduce), top-k over the
    T maxima, gather only those k tiles' scores and sort k·tile + ...
    candidates — ~6× less sort work at B=8192, k=10.

    Exact by the tournament argument: if a global top-k element e lived in
    a tile NOT among the top-k tiles by max, then ≥ k tiles would each
    hold an element > e, contradicting e ∈ top-k. Returns (scores (N, k),
    labels (N, k)) sorted desc.
    """
    n, b = sim.shape
    if b <= k:                            # block smaller than k: take all
        s, idx = jax.lax.top_k(sim, b)
        l = jnp.take_along_axis(jnp.broadcast_to(lblk, (n, b)), idx, axis=1)
        return (jnp.pad(s, ((0, 0), (0, k - b)), constant_values=-jnp.inf),
                jnp.pad(l, ((0, 0), (0, k - b)), constant_values=-1))
    t = min(tile, b)
    nt = b // t
    if nt < k or k * t + k >= b:          # tiny block — plain sort wins
        s, idx = jax.lax.top_k(sim, k)
        return s, jnp.take_along_axis(
            jnp.broadcast_to(lblk, (n, b)), idx, axis=1)
    bt = nt * t
    sim3 = sim[:, :bt].reshape(n, nt, t)
    tails = sim[:, bt:]                   # b % t leftovers (usually empty)
    tile_max = jnp.max(sim3, axis=2)                       # (N, T)
    _, tsel = jax.lax.top_k(tile_max, k)                   # (N, k)
    cand_s = jnp.take_along_axis(sim3, tsel[:, :, None],
                                 axis=1).reshape(n, k * t)
    lbl3 = jnp.broadcast_to(lblk[:bt].reshape(nt, t), (n, nt, t))
    cand_l = jnp.take_along_axis(lbl3, tsel[:, :, None],
                                 axis=1).reshape(n, k * t)
    if tails.shape[1]:
        cand_s = jnp.concatenate([cand_s, tails], axis=1)
        cand_l = jnp.concatenate(
            [cand_l, jnp.broadcast_to(lblk[bt:], (n, tails.shape[1]))],
            axis=1)
    s, idx = jax.lax.top_k(cand_s, k)
    return s, jnp.take_along_axis(cand_l, idx, axis=1)


def _approx_cfg(approx) -> tuple[bool, float]:
    """Decode the ``approx`` flag shared by every top-k API.

    ``approx`` is ``bool | float``: False → exact selection; True → binned
    ``lax.approx_max_k`` at its default recall_target (0.95); a float in
    (0, 1) → that recall_target (more bins, higher recall, slightly
    slower). A float ≥ 1.0 degrades to the exact path.

    Recall characterization (measured, pinned by
    ``tests/test_approx_adversarial.py``; BASELINE.md §serving):

    - **top-1 is structurally exact** for ANY input: the binned reduction
      keeps each bin's maximum, and the global maximum is the maximum of
      its own bin — rank-1 identification never degrades under approx.
    - Ranks 2..k lose recall ONLY when several top-k rows collide in one
      reduction bin. Bins stride the gallery-block index space, so
      *contiguous* near-duplicate rows (the natural clustered-gallery
      layout: one identity's rows stored together) land in distinct bins
      → recall 1.0 measured. The adversarial layout is top rows at
      positions aliasing the bin stride: recall@10 collapsed to 0.2 at
      stride 128 (M=8192, default target) — restored to 1.0 by
      recall_target 0.999 at every stride tried (32..256).
    - There is NO distribution-free floor above 1/k at the default
      target; callers who cannot rule out positional aliasing should pass
      ``approx=0.999`` (still ~1.5× the exact path) or keep exact.
    """
    if isinstance(approx, float) and not isinstance(approx, bool):
        return approx < 1.0, min(max(approx, 1e-3), 0.9999)
    return bool(approx), 0.95


def streaming_topk(probe_emb: jax.Array, gallery_emb: jax.Array,
                   gallery_labels: jax.Array, k: int = 10,
                   block: int = 4096, approx: bool | float = False):
    """Top-k gallery matches per probe WITHOUT materializing (N, M) sims.

    lax.scan over static gallery blocks; carries running (scores, labels)
    top-k per probe. Gallery is zero-padded to a block multiple; padding
    rows and rows with label < 0 score −inf. Returns (scores (N, k),
    labels (N, k)) sorted desc.

    ``approx`` (bool | float) swaps the exact hierarchical block selection
    for the TPU-native binned ``lax.approx_max_k`` (PartialReduce):
    measured 1.9× faster per 1M-row scan on v5e at recall@10 ≈ 0.998 /
    exact top-1 on scattered rows; a float sets the recall_target (see
    ``_approx_cfg`` for the full recall characterization incl. the
    adversarial stride-aliasing case). Returned scores are always the
    exact similarities of the selected rows. Use for serving; eval
    protocols default to exact.
    """
    p = _normalized(probe_emb)                             # (N, D)
    g = _normalized(gallery_emb)                           # (M, D)
    m = g.shape[0]
    nblocks = max(-(-m // block), 1)
    pad = nblocks * block - m
    g = jnp.pad(g, ((0, pad), (0, 0)))
    lbl = jnp.pad(jnp.asarray(gallery_labels), (0, pad), constant_values=-1)
    gb = g.reshape(nblocks, block, -1)
    lb = lbl.reshape(nblocks, block)
    valid = jnp.pad(jnp.ones((m,), bool), (0, pad)).reshape(nblocks, block)

    n = p.shape[0]
    init = (jnp.full((n, k), -jnp.inf, jnp.float32),
            jnp.full((n, k), -1, lbl.dtype))
    use_approx, recall_target = _approx_cfg(approx)

    def step(carry, xs):
        top_s, top_l = carry
        gblk, lblk, vblk = xs
        sim = jnp.dot(p, gblk.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (N, block)
        ok = vblk & (lblk >= 0)            # mask padding / sentinel rows
        sim = jnp.where(ok[None, :], sim, -jnp.inf)
        if use_approx and sim.shape[1] > k:
            blk_s, bi = jax.lax.approx_max_k(sim, k,
                                             recall_target=recall_target)
            blk_l = lblk[bi]
        else:
            blk_s, blk_l = _block_topk(sim, lblk, k)
        cat_s = jnp.concatenate([top_s, blk_s], axis=1)     # (N, 2k)
        cat_l = jnp.concatenate([top_l, blk_l], axis=1)
        new_s, idx = jax.lax.top_k(cat_s, k)
        new_l = jnp.take_along_axis(cat_l, idx, axis=1)
        return (new_s, new_l), None

    (scores, labels), _ = jax.lax.scan(step, init, (gb, lb, valid))
    return scores, labels


def sharded_topk(mesh: Mesh, k: int = 10, block: int = 4096,
                 approx: bool | float = False):
    """Build a mesh-sharded top-k: gallery rows sharded over the WHOLE mesh,
    probes replicated; per-shard streaming top-k then a k·n_shards merge.

    Returns fn(probe_emb, gallery_emb, gallery_labels) → (scores, labels),
    where gallery rows must divide evenly over the mesh (pad with labels=-1;
    ``topk_matches`` does this automatically).
    """
    axes = tuple(mesh.axis_names)

    def body(p, g, lbl):
        s, l = streaming_topk(p, g, lbl, k=k, block=block,
                              approx=approx)                 # local shard
        # Gather the k candidates from every shard and reduce. k·shards per
        # probe — tiny; rides ICI.
        all_s = s
        all_l = l
        for ax in axes:
            all_s = jax.lax.all_gather(all_s, ax, axis=1, tiled=True)
            all_l = jax.lax.all_gather(all_l, ax, axis=1, tiled=True)
        top_s, idx = jax.lax.top_k(all_s, k)
        top_l = jnp.take_along_axis(all_l, idx, axis=1)
        return top_s, top_l

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes)),
        out_specs=(P(), P()),
        check_rep=False,
    )


@partial(jax.jit, static_argnames=("k", "block", "approx"))
def _streaming_topk_jit(p, g, lbl, k: int, block: int,
                        approx: bool | float = False):
    return streaming_topk(p, g, lbl, k=k, block=block, approx=approx)


@lru_cache(maxsize=64)
def _sharded_topk_jit(mesh: Mesh, k: int, block: int, approx: bool | float):
    """Cached jitted sharded scan: ``sharded_topk`` builds a fresh
    shard_map closure per call, so a bare ``jax.jit`` around it would
    recompile the identical program on every ``topk_matches`` call
    (IJB-C 1:N calls it 4×/run; a TPU compile is seconds-to-minutes)."""
    return jax.jit(sharded_topk(mesh, k=k, block=block, approx=approx))


def _auto_block(block: int, n_probes: int) -> int:
    """Scan block size: bigger blocks amortize per-step scan overhead
    (measured 1.5× from 8k→64k on v5e at 256 probes) but the (N, block)
    f32 sim buffer must stay bounded — target ≤ 64M elements (256 MB)."""
    if block and block > 0:
        return block
    return int(np.clip((64 << 20) // max(n_probes, 1), 4096, 65536))


def topk_matches(probe_emb, gallery_emb, gallery_labels, k: int,
                 block: int = 0, mesh: Mesh | None = None,
                 approx: bool | float = False
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Per-probe top-k (scores, labels) against an arbitrarily large gallery.

    Dispatch: a >1-device mesh shards the gallery rows over it
    (``sharded_topk``); otherwise the single-device streaming scan. Handles
    gallery padding to mesh-divisible row counts (label −1, masked).
    ``block <= 0`` auto-sizes the scan block from the probe count.

    ``gallery_emb`` may also be an int8 ``eval.bank.QuantBank`` (serving
    banks from ``crfr extract --quantize-bank``): scoring then runs the
    s8×s8→s32 quantized scan with identical dispatch and contract;
    ``gallery_labels`` (if not None) overrides the bank's stored labels.

    ``approx`` (bool | float): binned ``lax.approx_max_k`` block
    selection — the serving fast path; a float sets the recall_target
    (``_approx_cfg`` documents the recall characterization: top-1 always
    exact, 0.999 defeats the adversarial stride-aliased layout). Exact
    scores for the selected rows either way.
    """
    from crfr.eval.bank import QuantBank, topk_matches_bank

    if isinstance(gallery_emb, QuantBank):
        b = gallery_emb
        if gallery_labels is not None:
            b = QuantBank(b.q, b.scale,
                          np.asarray(gallery_labels, np.int64))
        return topk_matches_bank(probe_emb, b, k=k, block=block, mesh=mesh,
                                 approx=approx)
    p = jnp.asarray(probe_emb)
    g = jnp.asarray(gallery_emb)
    lbl = jnp.asarray(np.asarray(gallery_labels))
    block = _auto_block(block, int(p.shape[0]))
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if mesh is not None and n_dev > 1:
        m = g.shape[0]
        padm = -(-m // n_dev) * n_dev
        if padm != m:
            g = jnp.pad(g, ((0, padm - m), (0, 0)))
            lbl = jnp.pad(lbl, (0, padm - m), constant_values=-1)
        fn = _sharded_topk_jit(mesh, k, min(block, padm // n_dev), approx)
        s, l = fn(p, g, lbl)
    else:
        s, l = _streaming_topk_jit(p, g, lbl, k,
                                   min(block, max(g.shape[0], 1)), approx)
    return np.asarray(s), np.asarray(l)


def _rank_from_topk(top_labels: np.ndarray, probe_labels: np.ndarray,
                    max_rank: int) -> tuple[np.ndarray, np.ndarray]:
    """(first-match rank hits) from score-sorted top-k labels.

    Returns (rank1_hits (N,) bool, cmc_hits (N, max_rank) bool). Exact for
    k ≥ max_rank (see module docstring).
    """
    top_labels = np.asarray(top_labels)[:, :max_rank]
    probe_labels = np.asarray(probe_labels)
    match = top_labels == probe_labels[:, None]
    found = match.any(axis=1)
    first = np.where(found, match.argmax(axis=1), max_rank)
    cmc_hits = first[:, None] < np.arange(1, max_rank + 1)[None, :]
    return first == 0, cmc_hits


# ---------------------------------------------------------------------------
# Dense reference (small galleries / golden tests)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_rank",))
def _dense_closed_set(probe_emb, gallery_emb, probe_labels, gallery_labels,
                      max_rank: int = 20):
    """One jitted GEMM + rank computation — the O(N·M)-memory golden the
    streaming path is tested against. Returns (rank1_hits, cmc_hits)."""
    p = _normalized(probe_emb)
    g = _normalized(gallery_emb)
    sim = jnp.dot(p, g.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)      # (N, M)
    match = probe_labels[:, None] == gallery_labels[None, :]  # (N, M)
    best_correct = jnp.max(jnp.where(match, sim, -jnp.inf), axis=1)
    above = jnp.sum((sim > best_correct[:, None]) & ~match, axis=1)  # (N,)
    ranks = above  # 0-indexed rank
    cmc_hits = ranks[:, None] < jnp.arange(1, max_rank + 1)[None, :]
    return ranks == 0, cmc_hits


# ---------------------------------------------------------------------------
# Protocol entry points
# ---------------------------------------------------------------------------


def closed_set_identification(probe_emb, gallery_emb, probe_labels,
                              gallery_labels, max_rank: int = 20,
                              mesh: Mesh | None = None, block: int = 0,
                              approx: bool | float = False
                              ) -> IdentificationResult:
    """SCface-style closed-set identification (every probe is enrolled).

    Streams the gallery in blocks (sharded over ``mesh`` when it has >1
    device) — usable unchanged at MS1M-gallery scale. ``approx=True``
    opts in to binned top-k selection (see ``topk_matches``) for
    huge-distractor galleries; protocols default to exact."""
    _, labels = topk_matches(probe_emb, gallery_emb, gallery_labels,
                             k=max_rank, block=block, mesh=mesh,
                             approx=approx)
    r1, cmc_hits = _rank_from_topk(labels, probe_labels, max_rank)
    return IdentificationResult(
        rank1=float(np.mean(r1)),
        cmc=cmc_hits.mean(axis=0),
        tpir_at_fpir={},
    )


def open_set_identification(probe_emb, gallery_emb, probe_labels,
                            gallery_labels, probe_mated,
                            fpir_targets=(1e-2, 1e-1), max_rank: int = 20,
                            mesh: Mesh | None = None, block: int = 0,
                            approx: bool | float = False
                            ) -> IdentificationResult:
    """TinyFace / QMUL-SurvFace open-set protocol.

    ``probe_mated`` (N,) bool: True where the probe identity is enrolled in
    the gallery. Reports the full CMC (rank-1/5/10/20 headline table) over
    MATED probes against the distractor-augmented gallery, plus TPIR@FPIR:
    FPIR(τ) = P(top_sim ≥ τ | unmated); TPIR(τ) = P(top_sim ≥ τ AND top-1
    identity correct | mated). Thresholds come from the unmated score
    quantiles (exact, no sweep grid). Gallery streams in blocks — native-LR
    sets with 10⁵-distractor galleries never materialize (N, M).
    ``approx=True``: binned selection fast path (default exact)."""
    scores, labels = topk_matches(probe_emb, gallery_emb, gallery_labels,
                                  k=max_rank, block=block, mesh=mesh,
                                  approx=approx)
    probe_labels = np.asarray(probe_labels)
    mated = np.asarray(probe_mated, dtype=bool)
    top_sim = scores[:, 0]
    top_label = labels[:, 0]

    r1_hits, cmc_hits = _rank_from_topk(labels, probe_labels, max_rank)
    correct = (top_label == probe_labels) & mated
    rank1 = float(correct[mated].mean()) if mated.any() else 0.0
    cmc = (cmc_hits[mated].mean(axis=0) if mated.any()
           else np.zeros(max_rank))

    tpir = {}
    unmated_scores = np.sort(top_sim[~mated])[::-1]
    for tgt in fpir_targets:
        # accept exactly k = floor(tgt·n) impostors: τ = (k+1)-th largest
        # unmated score with STRICT '>' acceptance (τ=−inf accepts all when
        # k ≥ n or there are no impostors).
        n_un = len(unmated_scores)
        k = int(np.floor(tgt * n_un))
        if n_un == 0 or k >= n_un:
            tau = -np.inf
        else:
            tau = unmated_scores[k]
        hit = (top_sim > tau) & correct
        tpir[float(tgt)] = float(hit[mated].mean()) if mated.any() else 0.0

    return IdentificationResult(rank1=rank1, cmc=np.asarray(cmc),
                                tpir_at_fpir=tpir)
