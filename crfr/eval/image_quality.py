"""Image-quality metrics for the hallucination stage — PSNR and SSIM
(the paper's SR-quality numbers; SURVEY.md §3.2 eval side).

Both are jitted, batched, and defined on [0, 255] pixel scale. SSIM follows
Wang et al. 2004 with the standard 11×11 Gaussian window (σ=1.5),
K1=0.01, K2=0.03 — matching skimage.metrics.structural_similarity with
gaussian_weights=True, use_sample_covariance=False.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def psnr(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Peak signal-to-noise ratio per image; (B,H,W,C)/(H,W,C) → (B,)/scalar."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    axes = tuple(range(a.ndim - 3, a.ndim)) if a.ndim >= 3 else None
    mse = jnp.mean(jnp.square(a - b), axis=axes)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("max_val",))
def ssim(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Mean SSIM per image pair; (B,H,W,C) → (B,). Gaussian-windowed,
    per-channel averaged."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    k = jnp.asarray(_gaussian_kernel())[:, :, None, None]       # (11,11,1,1)
    c = a.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, c))                            # depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_a = filt(a)
    mu_b = filt(b)
    mu_a2 = mu_a * mu_a
    mu_b2 = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = filt(a * a) - mu_a2
    var_b = filt(b * b) - mu_b2
    cov = filt(a * b) - mu_ab
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2 * mu_ab + c1) * (2 * cov + c2)
    den = (mu_a2 + mu_b2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
