"""Affine (similarity) warp — inverse-map bilinear resampling.

This is the crop step of 5-point alignment: given the forward 2×3 matrix from
``crfr.ops.similarity`` (src-image coords → 112×112 template coords), sample
the source image at the inverse-mapped location of every output pixel.
Capability-equivalent of the reference's ``cv2.warpAffine`` call
(SURVEY.md §2.2 native-capability table).

XLA path: the four neighbour fetches are advanced-index gathers over a static
112×112 coordinate grid; XLA fuses the bilinear blend. Border behaviour is
constant-zero outside the source (cv2.warpAffine default BORDER_CONSTANT 0).

Per-image transforms batch via vmap (each face has its own landmarks). A
Pallas variant for the full fused preprocess lives in fused_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crfr.ops.similarity import invert_affine


def _sample_bilinear(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """img (H,W,C); xs/ys (h,w) float source coords → (h,w,C)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def fetch(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img[yc, xc]                      # gather → (h, w, C)
        return v * valid[..., None].astype(img.dtype)

    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x0i + 1)
    v10 = fetch(y0i + 1, x0i)
    v11 = fetch(y0i + 1, x0i + 1)
    fx = fx[..., None].astype(img.dtype)
    fy = fy[..., None].astype(img.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_affine(img: jax.Array, matrix: jax.Array,
                out_hw: tuple[int, int] = (112, 112)) -> jax.Array:
    """Warp (H,W,C) float image by forward 2×3 ``matrix`` into ``out_hw``.

    Convention matches ``cv2.warpAffine(img, M, dsize)``: ``matrix`` maps
    source pixel centres (x, y) to destination; we invert and pull.
    """
    inv = invert_affine(matrix)
    oh, ow = out_hw
    xo = jnp.arange(ow, dtype=jnp.float32)
    yo = jnp.arange(oh, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xo, yo)            # (oh, ow)
    xs = inv[0, 0] * xg + inv[0, 1] * yg + inv[0, 2]
    ys = inv[1, 0] * xg + inv[1, 1] * yg + inv[1, 2]
    img = img.astype(jnp.float32)
    return _sample_bilinear(img, xs, ys)


# Batched: (B,H,W,C) images with per-image (B,2,3) matrices.
warp_affine_batch = jax.vmap(warp_affine, in_axes=(0, 0, None))


def align_crop(img: jax.Array, landmarks: jax.Array,
               out_size: int = 112) -> jax.Array:
    """End-to-end single-face alignment: landmarks → similarity solve → warp."""
    from crfr.ops.similarity import align_matrix
    m = align_matrix(landmarks)
    return warp_affine(img, m, (out_size, out_size))
