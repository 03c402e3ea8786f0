"""IJB-C template-based evaluation — 1:1 verification and 1:N identification
(SURVEY.md §2.1 "Identification eval" / BASELINE config 5).

Protocol (standard IJB-C conventions, to be re-cited against the reference
when its mount appears):

- A *template* is a set of stills/frames of one subject. Pooling is
  media-aware: embeddings are averaged within each media (video) first, the
  media means are averaged, and the result L2-normalized — so a long video
  doesn't dominate a template.
- 1:1: cosine similarity over a given list of template pairs; TAR@FAR at
  {1e-6 … 1e-1} computed EXACTLY from the sorted impostor scores (quantile
  thresholding), no threshold grid.
- 1:N: probe templates vs the two gallery splits; closed-set rank-k/CMC and
  open-set TPIR@FPIR via crfr.eval.identification.

TPU notes: pooling is two ``segment_sum``s (static segment counts) and the
pair scoring is a gather + row-dot — all jitted; the (probes × gallery)
similarity routes through ``crfr.eval.identification.topk_matches``
(streaming gallery-block scan; gallery sharded over ``mesh`` when one with
>1 device is passed), so the full similarity matrix is never materialized
regardless of gallery size.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_media", "n_templates"))
def pool_templates(embs: jax.Array, media_seg: jax.Array,
                   template_of_media: jax.Array, n_media: int,
                   n_templates: int) -> jax.Array:
    """Media-aware template pooling.

    embs (N, D) image embeddings; media_seg (N,) dense media index per image;
    template_of_media (M,) dense template index per media. → (T, D)
    L2-normalized template embeddings.
    """
    e = embs.astype(jnp.float32)
    media_sum = jax.ops.segment_sum(e, media_seg, num_segments=n_media)
    media_cnt = jax.ops.segment_sum(jnp.ones((e.shape[0], 1), jnp.float32),
                                    media_seg, num_segments=n_media)
    media_mean = media_sum / media_cnt.clip(1.0)
    tpl_sum = jax.ops.segment_sum(media_mean, template_of_media,
                                  num_segments=n_templates)
    tpl_cnt = jax.ops.segment_sum(jnp.ones((n_media, 1), jnp.float32),
                                  template_of_media,
                                  num_segments=n_templates)
    tpl = tpl_sum / tpl_cnt.clip(1.0)
    return tpl / jnp.linalg.norm(tpl, axis=-1, keepdims=True).clip(1e-12)


def make_template_index(template_ids: np.ndarray, media_ids: np.ndarray):
    """Dense-index the (template, media) structure of an image list.

    → (media_seg (N,), template_of_media (M,), template_uids (T,)).
    ``template_uids`` maps dense template index → original template id.
    """
    pair = np.stack([template_ids, media_ids], axis=1)
    uniq_media, media_seg = np.unique(pair, axis=0, return_inverse=True)
    tpl_uids, template_of_media = np.unique(uniq_media[:, 0],
                                            return_inverse=True)
    return (media_seg.astype(np.int32),
            template_of_media.astype(np.int32), tpl_uids)


@jax.jit
def _pair_scores(tpl_embs: jax.Array, idx1: jax.Array,
                 idx2: jax.Array) -> jax.Array:
    a = tpl_embs[idx1]
    b = tpl_embs[idx2]
    return jnp.sum(a * b, axis=-1)


def tar_at_far_exact(scores: np.ndarray, issame: np.ndarray,
                     far_targets=(1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1)
                     ) -> dict[float, float]:
    """Exact TAR@FAR from impostor-score quantiles (no grid)."""
    scores = np.asarray(scores)
    issame = np.asarray(issame, bool)
    pos = scores[issame]
    neg = np.sort(scores[~issame])[::-1]
    out = {}
    for tgt in far_targets:
        # accept exactly k = floor(tgt·n) impostors: thr = (k+1)-th largest
        # impostor score, STRICT '>' acceptance. k ≥ n → thr=−inf (accept
        # all); k == 0 → thr = max impostor (accept none of them).
        k = int(np.floor(tgt * len(neg)))
        if len(neg) == 0 or k >= len(neg):
            thr = -np.inf
        else:
            thr = neg[k]
        out[float(tgt)] = float((pos > thr).mean()) if len(pos) else 0.0
    return out


@dataclass
class IJBCResult:
    tar_at_far: dict[float, float]               # 1:1
    rank1: float | None = None                   # 1:N closed
    cmc: np.ndarray | None = None
    tpir_at_fpir: dict[float, float] | None = None


def ijbc_11(image_embs, template_ids, media_ids, pair_t1, pair_t2,
            pair_label, far_targets=(1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1),
            block: int = 1 << 20) -> IJBCResult:
    """1:1 verification. pair_t1/t2 hold ORIGINAL template ids; pair_label
    (P,) 1 for genuine. Scores computed in blocks of ``block`` pairs."""
    media_seg, tpl_of_media, tpl_uids = make_template_index(
        np.asarray(template_ids), np.asarray(media_ids))
    tpl = pool_templates(jnp.asarray(image_embs), jnp.asarray(media_seg),
                         jnp.asarray(tpl_of_media), int(media_seg.max()) + 1,
                         len(tpl_uids))
    lut = {t: i for i, t in enumerate(tpl_uids)}
    i1 = np.asarray([lut[t] for t in np.asarray(pair_t1)], np.int32)
    i2 = np.asarray([lut[t] for t in np.asarray(pair_t2)], np.int32)
    scores = np.empty(len(i1), np.float32)
    for s in range(0, len(i1), block):
        e = min(s + block, len(i1))
        scores[s:e] = np.asarray(_pair_scores(tpl, jnp.asarray(i1[s:e]),
                                              jnp.asarray(i2[s:e])))
    return IJBCResult(tar_at_far=tar_at_far_exact(scores, pair_label,
                                                  far_targets))


def pool_meta(image_embs, template_ids, media_ids, subject_ids
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pool one meta-list worth of image embeddings into templates.
    → (tpl_embs (T, D) f32 normalized, tpl_subjects (T,), tpl_uids (T,))."""
    template_ids = np.asarray(template_ids)
    media_ids = np.asarray(media_ids)
    subject_ids = np.asarray(subject_ids)
    media_seg, tpl_of_media, tpl_uids = make_template_index(template_ids,
                                                            media_ids)
    tpl = pool_templates(jnp.asarray(image_embs), jnp.asarray(media_seg),
                         jnp.asarray(tpl_of_media), int(media_seg.max()) + 1,
                         len(tpl_uids))
    # subject of each template = subject of any of its images (consistent)
    subj_of_tpl = np.empty(len(tpl_uids), subject_ids.dtype)
    lut = {t: i for i, t in enumerate(tpl_uids)}
    for t, s in zip(template_ids, subject_ids):
        subj_of_tpl[lut[t]] = s
    return np.asarray(tpl), subj_of_tpl, tpl_uids


def ijbc_1n_two_gallery(probe_embs, probe_subjects,
                        g1_embs, g1_subjects, g2_embs, g2_subjects,
                        fpir_targets=(1e-2, 1e-1), max_rank: int = 20,
                        mesh=None, block: int = 0, approx: bool = False
                        ) -> tuple[IJBCResult, IJBCResult, IJBCResult]:
    """Standard IJB-C 1:N: evaluate the probe set against EACH of the two
    disjoint gallery splits (G1/G2) and average — the convention the
    headline rank-k / TPIR@FPIR numbers use. → (avg, g1_result, g2_result)."""
    r1 = ijbc_1n(probe_embs, probe_subjects, g1_embs, g1_subjects,
                 fpir_targets, max_rank, mesh=mesh, block=block, approx=approx)
    r2 = ijbc_1n(probe_embs, probe_subjects, g2_embs, g2_subjects,
                 fpir_targets, max_rank, mesh=mesh, block=block, approx=approx)
    avg = IJBCResult(
        tar_at_far={},
        rank1=0.5 * (r1.rank1 + r2.rank1),
        cmc=0.5 * (np.asarray(r1.cmc) + np.asarray(r2.cmc)),
        tpir_at_fpir={k: 0.5 * (r1.tpir_at_fpir[k] + r2.tpir_at_fpir[k])
                      for k in r1.tpir_at_fpir})
    return avg, r1, r2


def ijbc_1n(probe_embs, probe_subjects, gallery_embs, gallery_subjects,
            fpir_targets=(1e-2, 1e-1), max_rank: int = 20,
            mesh=None, block: int = 0, approx: bool = False) -> IJBCResult:
    """1:N from POOLED template embeddings (run pool_templates first).
    Open-set TPIR@FPIR counts probes whose subject is absent from the
    gallery as unmated. Gallery streams in blocks (sharded over ``mesh``
    when >1 device) — no (N, M) buffer at any gallery size."""
    from crfr.eval.identification import (closed_set_identification,
                                          open_set_identification)

    probe_subjects = np.asarray(probe_subjects)
    gallery_subjects = np.asarray(gallery_subjects)
    mated = np.isin(probe_subjects, gallery_subjects)
    closed = closed_set_identification(
        np.asarray(probe_embs)[mated], gallery_embs,
        probe_subjects[mated], gallery_subjects, max_rank=max_rank,
        mesh=mesh, block=block, approx=approx)
    open_res = open_set_identification(
        probe_embs, gallery_embs, probe_subjects, gallery_subjects, mated,
        fpir_targets=fpir_targets, max_rank=max_rank, mesh=mesh, block=block,
        approx=approx)
    return IJBCResult(tar_at_far={}, rank1=closed.rank1, cmc=closed.cmc,
                      tpir_at_fpir=open_res.tpir_at_fpir)
