"""Landmark-heatmap prior targets (SURVEY.md §2.1 "Prior estimator").

FSRNet-style priors are landmark heatmaps / parsing maps. Given 5-point
landmarks (from dataset annotations or the MTCNN cascade), render one
Gaussian heatmap per landmark at the SR resolution — the supervised target
for ``PriorEstimator`` and the conditioning signal's ground truth in the
prior-consistency loss (crfr/losses/gan.py::prior_loss).

Pure jnp, static shapes; vmapped over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size", "sigma"))
def landmark_heatmaps(landmarks: jax.Array, size: int = 112,
                      sigma: float = 3.0) -> jax.Array:
    """landmarks (..., K, 2) in pixel coords → (..., size, size, K) heatmaps
    with a unit-peak Gaussian at each landmark."""
    xs = jnp.arange(size, dtype=jnp.float32)
    ys = jnp.arange(size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                        # (S, S)

    def one(lm):                                         # (K, 2) → (S, S, K)
        dx = gx[None] - lm[:, 0][:, None, None]          # (K, S, S)
        dy = gy[None] - lm[:, 1][:, None, None]
        h = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        return jnp.transpose(h, (1, 2, 0))

    batch_shape = landmarks.shape[:-2]
    flat = landmarks.reshape((-1,) + landmarks.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + (size, size, landmarks.shape[-2]))


def prior_target_fn(landmarks: jax.Array, size: int = 112,
                    sigma: float = 3.0):
    """Close over per-batch landmarks → an SRTrainer-compatible
    ``prior_target_fn(hr_images)`` (the images argument is ignored; the
    heatmaps come from the annotations that ride with the batch)."""
    maps = landmark_heatmaps(landmarks, size, sigma)

    def f(_hr_images):
        return maps

    return f
