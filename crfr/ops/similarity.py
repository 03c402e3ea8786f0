"""5-point-landmark similarity-transform alignment solver.

Implements the BASELINE contract's "5-point landmark similarity-transform
alignment": solve the least-squares similarity transform (rotation + uniform
scale + translation, 4 DoF) mapping detected eye/eye/nose/mouth-corner
landmarks onto the canonical 112×112 template, in the style of MATLAB's
``cp2tform('nonreflective similarity')`` that the reference's code family
(face.evoLVe ``align/matlab_cp2tform.py: findNonreflectiveSimilarity``) uses.

TPU-first notes: the solve is a closed-form 4×4 normal-equation solve — pure
jnp, jittable, vmappable over a batch of landmark sets. No SVD is needed for
the non-reflective case, and for 2-D the non-reflective LSQ optimum coincides
with Umeyama's SVD solution restricted to proper rotations (both minimize
Σ‖sRp+t−q‖² over the same 4-parameter family); tests/test_similarity.py checks
this against ``skimage``-equivalent golden values computed with NumPy.

The reflective variant (MATLAB ``findSimilarity`` tries both chiralities and
keeps the better fit) is provided for completeness via ``similarity_transform
(..., allow_reflection=True)`` using a branchless residual comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical 5-point template for a 112×112 crop (insightface/ArcFace
# convention; the 96×112 variant is the same minus the 8 px x-offset).
REFERENCE_LANDMARKS_112 = np.array(
    [
        [38.2946, 51.6963],   # left eye
        [73.5318, 51.5014],   # right eye
        [56.0252, 71.7366],   # nose tip
        [41.5493, 92.3655],   # left mouth corner
        [70.7299, 92.2041],   # right mouth corner
    ],
    dtype=np.float32,
)

REFERENCE_LANDMARKS_96x112 = REFERENCE_LANDMARKS_112 - np.array([8.0, 0.0], np.float32)


def _solve_nonreflective(src: jax.Array, dst: jax.Array) -> jax.Array:
    """LSQ [a, b, tx, ty] s.t. u = a·x − b·y + tx, v = b·x + a·y + ty.

    src, dst: (N, 2) float. Returns the 2×3 forward matrix [[a,−b,tx],[b,a,ty]].
    Solved via 4×4 normal equations (well-conditioned for landmark spreads).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    # Centering decouples translation from (a, b): the normal equations
    # become diagonal, so the optimum is closed-form — no linear solve, exact
    # in f32 regardless of landmark magnitudes (a raw 4×4 solve at ~100 px
    # coordinates is ill-conditioned enough to cost ~1e-2 in f32).
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    ps = src - mu_s
    pd = dst - mu_d
    x, y = ps[:, 0], ps[:, 1]
    u, v = pd[:, 0], pd[:, 1]
    denom = jnp.sum(x * x + y * y)
    a_ = jnp.sum(x * u + y * v) / denom
    b_ = jnp.sum(x * v - y * u) / denom
    m = jnp.stack([jnp.stack([a_, -b_]), jnp.stack([b_, a_])])
    t = mu_d - m @ mu_s
    return jnp.concatenate([m, t[:, None]], axis=1)


def _apply(mat: jax.Array, pts: jax.Array) -> jax.Array:
    return pts @ mat[:, :2].T + mat[:, 2]


def similarity_transform(src: jax.Array, dst: jax.Array,
                         allow_reflection: bool = False) -> jax.Array:
    """Forward 2×3 similarity matrix mapping ``src`` landmarks onto ``dst``.

    ``allow_reflection=True`` mirrors MATLAB ``findSimilarity``: also solve
    with x-mirrored source and keep whichever chirality fits better
    (branchless ``jnp.where`` so it stays jit/vmap-friendly).
    """
    m1 = _solve_nonreflective(src, dst)
    if not allow_reflection:
        return m1
    src_r = src * jnp.array([-1.0, 1.0], dtype=jnp.float32)
    m2r = _solve_nonreflective(src_r, dst)
    # Undo the mirroring: compose with diag(-1, 1) on the input side.
    m2 = jnp.concatenate(
        [m2r[:, :1] * -1.0, m2r[:, 1:2], m2r[:, 2:]], axis=1)
    r1 = jnp.sum((_apply(m1, src) - dst) ** 2)
    r2 = jnp.sum((_apply(m2, src) - dst) ** 2)
    return jnp.where(r1 <= r2, m1, m2)


def umeyama_transform(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Umeyama similarity estimate (SVD form, as in skimage
    ``SimilarityTransform.estimate`` used by insightface ``norm_crop``).

    For 2-D non-degenerate landmark sets this equals ``similarity_transform``;
    it is kept as an independent formulation for cross-checking in tests.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0], jnp.float32).at[1].set(d)
    r = (u * diag[None, :]) @ vt
    var_s = (sc ** 2).sum() / n
    scale = (s * diag).sum() / var_s
    t = mu_d - scale * (r @ mu_s)
    return jnp.concatenate([scale * r, t[:, None]], axis=1)


def invert_affine(mat: jax.Array) -> jax.Array:
    """Invert a 2×3 affine matrix (for inverse-map warping)."""
    a = mat[:, :2]
    t = mat[:, 2]
    ainv = jnp.linalg.inv(a)
    return jnp.concatenate([ainv, (-ainv @ t)[:, None]], axis=1)


def align_matrix(landmarks: jax.Array, template: jax.Array | None = None,
                 allow_reflection: bool = False) -> jax.Array:
    """Per-face alignment matrix; vmap over (B, 5, 2) landmarks for batches."""
    if template is None:
        template = jnp.asarray(REFERENCE_LANDMARKS_112)
    return similarity_transform(landmarks, template, allow_reflection)


align_matrix_batch = jax.vmap(align_matrix, in_axes=(0, None, None))
