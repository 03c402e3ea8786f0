"""Verification evaluation — LFW-style 10-fold protocol, fully vectorized.

Implements SURVEY.md §2.1 "Verification eval" / §3.3 and the BASELINE metric
path ("verification … batched cosine similarity, TAR@FAR"):

- embeddings for both pair members (optionally flip-TTA fused),
- squared-L2-of-normalized distance d = 2 − 2·cosθ (the convention of the
  facenet/insightface `calculate_roc` lineage; monotone in cosine),
- 10-fold cross-validation: threshold swept on the 9 train folds, accuracy
  reported on the held-out fold; mean ± std across folds,
- TAR@FAR: threshold calibrated on train folds to hit the target FAR
  (interpolated on the FAR curve), TAR measured on the test fold.

TPU-first: no sklearn KFold loop — ALL thresholds × ALL pairs evaluate as one
(T, N) boolean broadcast; folds are static masks; the whole protocol jits to
a single XLA program. Fold order is the canonical contiguous split of the
pairs list (KFold(n_splits, shuffle=False) semantics — pinned by a synthetic
protocol test; re-cite against the reference when its mount appears).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class VerificationResult:
    accuracy_mean: float
    accuracy_std: float
    best_thresholds: np.ndarray          # (n_folds,) distance thresholds
    tar_at_far: dict[float, float]       # target FAR → measured TAR
    fold_accuracies: np.ndarray
    eer: float = float("nan")            # equal-error rate (global, no folds)


def compute_eer(dist: np.ndarray, issame: np.ndarray) -> float:
    """Equal-error rate: the operating point where FAR == FRR, linearly
    interpolated on the sorted genuine/impostor distance distributions."""
    dist = np.asarray(dist)
    issame = np.asarray(issame, bool)
    pos = np.sort(dist[issame])          # genuine distances (small = accept)
    neg = np.sort(dist[~issame])
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    vals = np.unique(np.concatenate([pos, neg]))
    # candidate thresholds BETWEEN observed values (accept iff d < t), plus
    # the outer extremes — otherwise separated distributions miss the gap.
    ts = np.concatenate([[vals[0] - 1], (vals[:-1] + vals[1:]) / 2,
                         [vals[-1] + 1]])
    frr = 1.0 - np.searchsorted(pos, ts, "left") / len(pos)
    far = np.searchsorted(neg, ts, "right") / len(neg)  # accepted impostors
    k = np.argmin(np.abs(far - frr))
    return float((far[k] + frr[k]) / 2)


def fuse_flip_features(emb: jax.Array, emb_flip: jax.Array,
                       mode: str = "sum") -> jax.Array:
    """Flip-TTA fusion: 'sum' (insightface convention) or 'concat'."""
    if mode == "sum":
        return emb + emb_flip
    if mode == "concat":
        return jnp.concatenate([emb, emb_flip], axis=-1)
    raise ValueError(f"unknown flip fusion {mode!r}")


def _normalized(x):
    x = x.astype(jnp.float32)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def pair_distances(emb1: jax.Array, emb2: jax.Array) -> jax.Array:
    """d = 2 − 2·cos for each pair; (N,) f32."""
    e1 = _normalized(emb1)
    e2 = _normalized(emb2)
    cos = jnp.sum(e1 * e2, axis=-1)
    return 2.0 - 2.0 * cos


def _fold_masks(n: int, n_folds: int) -> np.ndarray:
    """(n_folds, n) boolean — contiguous KFold(shuffle=False) test masks."""
    sizes = np.full(n_folds, n // n_folds)
    sizes[: n % n_folds] += 1
    masks = np.zeros((n_folds, n), dtype=bool)
    start = 0
    for i, s in enumerate(sizes):
        masks[i, start:start + s] = True
        start += s
    return masks


@partial(jax.jit, static_argnames=("n_folds", "n_thresholds"))
def _protocol(dist: jax.Array, issame: jax.Array, fold_masks: jax.Array,
              far_targets: jax.Array, n_folds: int = 10,
              n_thresholds: int = 400):
    """The full 10-fold protocol as one jitted program.

    dist (N,), issame (N,) bool, fold_masks (F, N) bool (test-fold masks).
    Returns (fold_accs (F,), best_thr (F,), tar (F, K), far_reached (F, K)).
    """
    thresholds = jnp.linspace(0.0, 4.0, n_thresholds)
    pred = dist[None, :] < thresholds[:, None]           # (T, N) "same" calls
    correct = pred == issame[None, :]

    test_m = fold_masks.astype(jnp.float32)              # (F, N)
    train_m = 1.0 - test_m
    n_test = test_m.sum(axis=1)
    n_train = train_m.sum(axis=1)

    # (F, T) train accuracy per threshold → per-fold argmax threshold.
    train_acc = jnp.einsum("tn,fn->ft", correct.astype(jnp.float32), train_m)
    train_acc = train_acc / n_train[:, None]
    best_idx = jnp.argmax(train_acc, axis=1)             # (F,)
    best_thr = thresholds[best_idx]

    test_correct = jnp.einsum("tn,fn->ft", correct.astype(jnp.float32), test_m)
    fold_acc = jnp.take_along_axis(test_correct / n_test[:, None],
                                   best_idx[:, None], axis=1)[:, 0]

    # --- TAR@FAR ---------------------------------------------------------
    pos = issame.astype(jnp.float32)
    neg = 1.0 - pos
    # train-fold FAR/TAR curves per threshold (F, T)
    fp = jnp.einsum("tn,fn->ft", (pred & ~issame[None, :]).astype(jnp.float32),
                    train_m)
    tp = jnp.einsum("tn,fn->ft", (pred & issame[None, :]).astype(jnp.float32),
                    train_m)
    nneg_train = jnp.einsum("n,fn->f", neg, train_m)
    far_train = fp / nneg_train[:, None].clip(1.0)

    # test-fold counts
    fp_te = jnp.einsum("tn,fn->ft", (pred & ~issame[None, :]).astype(jnp.float32),
                       test_m)
    tp_te = jnp.einsum("tn,fn->ft", (pred & issame[None, :]).astype(jnp.float32),
                       test_m)
    npos_test = jnp.einsum("n,fn->f", pos, test_m)
    nneg_test = jnp.einsum("n,fn->f", neg, test_m)

    def tar_for_target(tgt):
        # Per fold: smallest-threshold crossing of the train FAR curve
        # (far_train is monotone nondecreasing in t since pred grows with t).
        # Interpolate threshold index, then evaluate test TAR/FAR there.
        def one_fold(far_row, tp_row, fp_row, npos, nneg):
            thr = jnp.interp(tgt, far_row, thresholds)
            # piecewise eval of test curves at thr
            tpi = jnp.interp(thr, thresholds, tp_row)
            fpi = jnp.interp(thr, thresholds, fp_row)
            return tpi / jnp.maximum(npos, 1.0), fpi / jnp.maximum(nneg, 1.0)
        return jax.vmap(one_fold)(far_train, tp_te, fp_te, npos_test, nneg_test)

    tar, far_reached = jax.vmap(tar_for_target)(far_targets)  # (K, F) each
    return fold_acc, best_thr, tar.T, far_reached.T


def evaluate_verification(emb1, emb2, issame, n_folds: int = 10,
                          far_targets=(1e-3, 1e-2)) -> VerificationResult:
    """Full verification protocol from pair embeddings.

    emb1/emb2: (N, D) embeddings of pair members (already flip-fused if
    desired); issame: (N,) bool ground truth.
    """
    emb1 = jnp.asarray(emb1)
    emb2 = jnp.asarray(emb2)
    issame = jnp.asarray(issame, dtype=bool)
    n = emb1.shape[0]
    dist = pair_distances(emb1, emb2)
    masks = jnp.asarray(_fold_masks(n, n_folds))
    fa, thr, tar, far_r = _protocol(dist, issame, masks,
                                    jnp.asarray(far_targets, jnp.float32),
                                    n_folds=n_folds)
    fa = np.asarray(fa)
    tar = np.asarray(tar)                                # (F, K)
    return VerificationResult(
        accuracy_mean=float(fa.mean()),
        accuracy_std=float(fa.std()),
        best_thresholds=np.asarray(thr),
        tar_at_far={float(t): float(tar[:, i].mean())
                    for i, t in enumerate(far_targets)},
        fold_accuracies=fa,
        eer=compute_eer(np.asarray(dist), np.asarray(issame)),
    )
