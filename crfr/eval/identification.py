"""Identification evaluation — closed-set rank-k/CMC and open-set TPIR@FPIR.

Implements SURVEY.md §2.1 "Identification eval" / §3.4 and BASELINE configs
2–3: SCface d1/d2/d3 LR probes vs HR mugshot gallery (closed set, rank-1 and
CMC) and TinyFace / QMUL-SurvFace open-set identification (TPIR@FPIR).

TPU-first design (SURVEY.md §5.7 — the "long-context analog" of this
workload): the probe×gallery cosine similarity S = P̂·Ĝᵀ is a pure GEMM. For
small galleries it is one jitted matmul. For large galleries (MS1M/IJB-C
scale) ``streaming_topk`` never materializes S: a ``lax.scan`` streams over
static gallery blocks keeping a running per-probe top-k (flash-attention-style
blockwise reduction), and ``sharded_topk`` runs that same streaming body under
``shard_map`` with the GALLERY axis sharded over the mesh — each device scans
its gallery shard, then the per-shard top-k candidates are all-gathered
(k·mesh entries per probe, tiny) and reduced. The full similarity matrix
never exists on any chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

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


@partial(jax.jit, static_argnames=("max_rank",))
def _closed_set(probe_emb, gallery_emb, probe_labels, gallery_labels,
                max_rank: int = 20):
    """One jitted GEMM + rank computation.

    Returns (rank1_hits (N,), cmc_hits (N, max_rank)).
    """
    p = _normalized(probe_emb)
    g = _normalized(gallery_emb)
    sim = jnp.dot(p, g.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)      # (N, M)
    # Rank of the best-scoring correct-identity gallery entry: count the
    # gallery entries of WRONG identity scoring strictly above it.
    match = probe_labels[:, None] == gallery_labels[None, :]  # (N, M)
    best_correct = jnp.max(jnp.where(match, sim, -jnp.inf), axis=1)
    above = jnp.sum((sim > best_correct[:, None]) & ~match, axis=1)  # (N,)
    ranks = above  # 0-indexed rank
    cmc_hits = ranks[:, None] < jnp.arange(1, max_rank + 1)[None, :]
    return ranks == 0, cmc_hits


def closed_set_identification(probe_emb, gallery_emb, probe_labels,
                              gallery_labels, max_rank: int = 20
                              ) -> IdentificationResult:
    """SCface-style closed-set identification (every probe is enrolled)."""
    r1, cmc_hits = _closed_set(jnp.asarray(probe_emb), jnp.asarray(gallery_emb),
                               jnp.asarray(probe_labels),
                               jnp.asarray(gallery_labels), max_rank=max_rank)
    return IdentificationResult(
        rank1=float(jnp.mean(r1)),
        cmc=np.asarray(jnp.mean(cmc_hits, axis=0)),
        tpir_at_fpir={},
    )


@jax.jit
def _open_set_scores(probe_emb, gallery_emb, gallery_labels):
    p = _normalized(probe_emb)
    g = _normalized(gallery_emb)
    sim = jnp.dot(p, g.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    top_idx = jnp.argmax(sim, axis=1)
    top_sim = jnp.max(sim, axis=1)
    top_label = gallery_labels[top_idx]
    return top_sim, top_label


def open_set_identification(probe_emb, gallery_emb, probe_labels,
                            gallery_labels, probe_mated,
                            fpir_targets=(1e-2, 1e-1)) -> IdentificationResult:
    """TinyFace / QMUL-SurvFace open-set protocol.

    ``probe_mated`` (N,) bool: True where the probe identity is enrolled in
    the gallery. FPIR(τ) = P(top_sim ≥ τ | unmated); TPIR(τ) = P(top_sim ≥ τ
    AND top-1 identity correct | mated). Thresholds come from the unmated
    score quantiles (exact, no sweep grid).
    """
    top_sim, top_label = _open_set_scores(jnp.asarray(probe_emb),
                                          jnp.asarray(gallery_emb),
                                          jnp.asarray(gallery_labels))
    top_sim = np.asarray(top_sim)
    top_label = np.asarray(top_label)
    probe_labels = np.asarray(probe_labels)
    mated = np.asarray(probe_mated, dtype=bool)

    correct = (top_label == probe_labels) & mated
    rank1 = float(correct[mated].mean()) if mated.any() else 0.0

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

    return IdentificationResult(rank1=rank1, cmc=np.asarray([rank1]),
                                tpir_at_fpir=tpir)


# ---------------------------------------------------------------------------
# Streaming / sharded top-k for MS1M- and IJB-C-scale galleries
# ---------------------------------------------------------------------------


def streaming_topk(probe_emb: jax.Array, gallery_emb: jax.Array,
                   gallery_labels: jax.Array, k: int = 10,
                   block: int = 4096):
    """Top-k gallery matches per probe WITHOUT materializing (N, M) sims.

    lax.scan over static gallery blocks; carries running (scores, labels)
    top-k per probe. Gallery is zero-padded to a block multiple (padding
    scores −inf). Returns (scores (N, k), labels (N, k)) sorted desc.
    """
    p = _normalized(probe_emb)                             # (N, D)
    g = _normalized(gallery_emb)                           # (M, D)
    m = g.shape[0]
    nblocks = -(-m // block)
    pad = nblocks * block - m
    g = jnp.pad(g, ((0, pad), (0, 0)))
    lbl = jnp.pad(jnp.asarray(gallery_labels), (0, pad), constant_values=-1)
    gb = g.reshape(nblocks, block, -1)
    lb = lbl.reshape(nblocks, block)
    valid = jnp.pad(jnp.ones((m,), bool), (0, pad)).reshape(nblocks, block)

    n = p.shape[0]
    init = (jnp.full((n, k), -jnp.inf, jnp.float32),
            jnp.full((n, k), -1, lbl.dtype))

    def step(carry, xs):
        top_s, top_l = carry
        gblk, lblk, vblk = xs
        sim = jnp.dot(p, gblk.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (N, block)
        sim = jnp.where(vblk[None, :], sim, -jnp.inf)
        cat_s = jnp.concatenate([top_s, sim], axis=1)
        cat_l = jnp.concatenate([top_l, jnp.broadcast_to(lblk, (n, block))],
                                axis=1)
        new_s, idx = jax.lax.top_k(cat_s, k)
        new_l = jnp.take_along_axis(cat_l, idx, axis=1)
        return (new_s, new_l), None

    (scores, labels), _ = jax.lax.scan(step, init, (gb, lb, valid))
    return scores, labels


def sharded_topk(mesh: Mesh, k: int = 10, block: int = 4096):
    """Build a mesh-sharded top-k: gallery rows sharded over the WHOLE mesh,
    probes replicated; per-shard streaming top-k then a k·n_shards merge.

    Returns fn(probe_emb, gallery_emb, gallery_labels) → (scores, labels),
    where gallery rows must divide evenly over the mesh (pad with labels=-1).
    """
    axes = tuple(mesh.axis_names)

    def body(p, g, lbl):
        s, l = streaming_topk(p, g, lbl, k=k, block=block)   # local shard
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
