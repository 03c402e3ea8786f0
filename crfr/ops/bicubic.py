"""Bicubic resize as static weight-matrix matmuls — TPU-native by design.

Separable resampling along one axis is a *linear* map, so instead of the
gather-based formulation GPUs use (the reference leans on ``cv2.resize`` /
``PIL.Image.resize`` SIMD code — SURVEY.md §2.2), we precompute the exact
(out_size × in_size) interpolation matrix on the host once per static shape and
evaluate the resize as two dense matmuls:

    out[b, o, p, c] = Σ_i Σ_j  Wr[o, i] · img[b, i, j, c] · Wc[p, j]

which XLA tiles straight onto the MXU, batches over B·C, and fuses with
neighbouring elementwise work. No dynamic shapes, no gathers, no host round
trip.

Parity-critical semantics (SURVEY.md §7 "hard parts" #1): PIL and OpenCV
bicubic disagree, and the reference mount is empty, so BOTH are first-class
modes pinned by golden tests against the real libraries (tests/test_bicubic.py):

- ``mode='pil'``: Catmull-Rom-style cubic with a=-0.5, **antialiased on
  downscale** (kernel support stretched by the scale factor), weights
  renormalized over in-bounds taps — bit-matching ``PIL.Image.resize(...,
  Image.BICUBIC)`` up to float error.
- ``mode='cv2'``: cubic with a=-0.75, 4 taps, **no antialias**, replicate
  border — matching ``cv2.resize(..., interpolation=cv2.INTER_CUBIC)``.

The degradation augmentation (112 → k → 112, k ∈ [8, 112]) composes the down
and up matrices into a single 112×112 operator per k (``degrade_matrix``), so
the whole augmentation is ONE pair of matmuls regardless of k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter ``a``."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, mode: str = "pil") -> np.ndarray:
    """Exact 1-D bicubic resampling matrix (out_size, in_size), float32.

    Cached per static (in, out, mode) triple; built in float64 on host.
    """
    if mode == "pil":
        return _pil_matrix(in_size, out_size).astype(np.float32)
    if mode == "cv2":
        return _cv2_matrix(in_size, out_size).astype(np.float32)
    raise ValueError(f"unknown resize mode {mode!r} (want 'pil' or 'cv2')")


def _pil_matrix(in_size: int, out_size: int) -> np.ndarray:
    # Mirrors PIL's ImagingResampleHorizontal precompute_coeffs():
    # scale = in/out; filterscale = max(scale, 1) gives downscale antialiasing;
    # support = 2 * filterscale; weights normalized over in-bounds taps.
    a = -0.5
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax)
        w = _cubic((taps + 0.5 - center) / filterscale, a)
        s = w.sum()
        if s != 0:
            w = w / s
        W[o, xmin:xmax] = w
    return W


def _cv2_matrix(in_size: int, out_size: int) -> np.ndarray:
    # cv2 INTER_CUBIC: a=-0.75, always 4 taps around fx=(o+0.5)*scale-0.5,
    # no antialias, taps clamped to the image (replicate border).
    a = -0.75
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        fx = (o + 0.5) * scale - 0.5
        sx = int(np.floor(fx))
        frac = fx - sx
        taps = np.array([sx - 1, sx, sx + 1, sx + 2])
        w = _cubic(np.array([1.0 + frac, frac, 1.0 - frac, 2.0 - frac]), a)
        # cv2 weights sum to 1 exactly for the untruncated stencil; replicate
        # border folds out-of-range taps onto the edge pixel.
        for t, wt in zip(taps, w):
            W[o, min(max(t, 0), in_size - 1)] += wt
    return W


@functools.lru_cache(maxsize=256)
def degrade_matrix(size: int, low: int, mode: str = "pil") -> np.ndarray:
    """Composed (size×size) operator: bicubic down to ``low`` then back up."""
    down = resize_matrix(size, low, mode).astype(np.float64)
    up = resize_matrix(low, size, mode).astype(np.float64)
    return (up @ down).astype(np.float32)


def _apply_separable(img: jax.Array, wr: jax.Array, wc: jax.Array) -> jax.Array:
    """out = Wr · img · Wcᵀ over the two spatial axes of NHWC (or HWC/HW)."""
    spatial = img.ndim - (1 if img.ndim >= 3 else 0) - (1 if img.ndim == 4 else 0)
    del spatial  # ndim dispatch below is clearer
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dt)
    wr = wr.astype(dt)
    wc = wc.astype(dt)
    # precision='highest': on TPU a DEFAULT-precision f32 matmul truncates
    # inputs to bf16, which costs ~0.4/255 in pixel space — outside the
    # parity budget. The bench-oriented fused path opts into bf16 explicitly.
    if img.ndim == 2:       # (H, W)
        return jnp.einsum("oi,ij,pj->op", wr, x, wc,
                          preferred_element_type=dt, precision="highest")
    if img.ndim == 3:       # (H, W, C)
        return jnp.einsum("oi,ijc,pj->opc", wr, x, wc,
                          preferred_element_type=dt, precision="highest")
    if img.ndim == 4:       # (B, H, W, C)
        return jnp.einsum("oi,bijc,pj->bopc", wr, x, wc,
                          preferred_element_type=dt, precision="highest")
    raise ValueError(f"rank-{img.ndim} input not supported")


def _apply_axis(img: jax.Array, w: jax.Array, axis_row: bool) -> jax.Array:
    """Apply a 1-D resampling matrix along the row (H) or column (W) axis."""
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dt)
    w = w.astype(dt)
    row_eq = {2: "oi,ij->oj", 3: "oi,ijc->ojc", 4: "oi,bijc->bojc"}
    col_eq = {2: "ij,pj->ip", 3: "ijc,pj->ipc", 4: "bijc,pj->bipc"}
    eq = (row_eq if axis_row else col_eq)[img.ndim]
    args = (w, x) if axis_row else (x, w)
    return jnp.einsum(eq, *args, preferred_element_type=dt,
                      precision="highest")


def resize_bicubic(img: jax.Array, out_hw: tuple[int, int],
                   mode: str = "pil", u8_pipeline: bool = False) -> jax.Array:
    """Bicubic resize of (B,H,W,C) / (H,W,C) / (H,W) to ``out_hw``.

    Implemented as two static matmuls (see module docstring). Matches PIL or
    cv2 semantics per ``mode``; float output.

    ``u8_pipeline=True`` emulates PIL's 8-bit-per-channel pipeline exactly:
    PIL resamples **horizontal-first with a uint8 intermediate image**
    (verified empirically — matching it requires round+clip between the two
    passes). Use only for strict uint8 golden parity; the default float path
    equals PIL's own float ('F'-mode) resampling to ~4e-5 and is the better
    numerical citizen inside a fused preprocessing graph. cv2 keeps an int
    intermediate wide enough that a single final rounding suffices, so the
    flag is a no-op-in-spirit there (still applied for symmetry).
    """
    h, w = (img.shape[0], img.shape[1]) if img.ndim <= 3 else (img.shape[1], img.shape[2])
    oh, ow = out_hw
    wr = jnp.asarray(resize_matrix(h, oh, mode))
    wc = jnp.asarray(resize_matrix(w, ow, mode))
    if not u8_pipeline:
        return _apply_separable(img, wr, wc)
    # PIL's fixed-point clip8 rounds HALF-UP (floor(x+0.5)), not half-even.
    tmp = _apply_axis(img, wc, axis_row=False)        # horizontal pass
    tmp = jnp.clip(jnp.floor(tmp + 0.5), 0.0, 255.0)  # uint8 intermediate
    out = _apply_axis(tmp, wr, axis_row=True)         # vertical pass
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)


def degrade_updown(img: jax.Array, low: int, mode: str = "pil",
                   round_intermediate: bool = False) -> jax.Array:
    """Resolution-degradation augmentation: bicubic down to ``low``×``low``,
    back up to the original size (BASELINE: "16×16→112 bicubic probe
    degradation"; training draws ``low`` from [degrade_min, degrade_max]).

    With ``round_intermediate=False`` the down+up pair composes into ONE
    precomputed operator per axis (a single matmul pair, independent of
    ``low``). ``round_intermediate=True`` emulates a pipeline that materialises
    the low-res image as uint8 between the two resizes (clamp+round), which is
    what a PIL/cv2-on-files reference does; use for strict parity runs.
    """
    h = img.shape[0] if img.ndim <= 3 else img.shape[1]
    w = img.shape[1] if img.ndim <= 3 else img.shape[2]
    if round_intermediate:
        small = resize_bicubic(img, (low, low), mode, u8_pipeline=True)
        return resize_bicubic(small, (h, w), mode, u8_pipeline=True)
    wr = jnp.asarray(degrade_matrix(h, low, mode))
    wc = jnp.asarray(degrade_matrix(w, low, mode))
    return _apply_separable(img, wr, wc)


def random_degrade(img: jax.Array, key: jax.Array, low_min: int, low_max: int,
                   mode: str = "pil") -> jax.Array:
    """Per-batch random-resolution degradation under jit.

    Data-dependent resolution is handled the XLA way: precompute the composed
    112×112 degradation operators for every ``low`` in [low_min, low_max] as a
    stacked constant (L,S,S), then index with the random draw — one dynamic
    index into a static table instead of a dynamic shape.

    For per-*sample* resolution use vmap over the batch with split keys.
    """
    size = img.shape[-3] if img.ndim >= 3 else img.shape[0]
    lows = list(range(low_min, low_max + 1))
    table = np.stack([degrade_matrix(size, l, mode) for l in lows])  # (L,S,S)
    tbl = jnp.asarray(table)
    idx = jax.random.randint(key, (), 0, len(lows))
    wr = tbl[idx]
    return _apply_separable(img, wr, wr)
