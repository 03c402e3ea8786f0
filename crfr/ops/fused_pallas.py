"""Pallas-fused preprocessing: degrade (down→up bicubic) + normalize + cast,
one kernel, zero intermediate HBM round-trips (SURVEY.md §7 Phase 2; the
BASELINE "preprocessing hot path fuses into Pallas/XLA kernels" bullet).

Design: the composed degradation operator W (S×S, crfr.ops.bicubic
.degrade_matrix) turns the whole augmentation into out = W·X·Wᵀ per channel.
One grid program per image (fits easily in VMEM: 112·112·3·4B ≈ 150 KB in +
out + operator), contractions on the MXU via dot_general, the
(x−127.5)/128 epilogue and the bf16 cast fused in the same program.

Division of labour on the preprocessing path (measured, see bench):
- dense resampling stage (degrade / resize): THIS kernel;
- similarity-warp alignment: stays an XLA gather — Mosaic has no efficient
  dynamic-gather primitive, XLA:TPU lowers the 4-tap bilinear gather well,
  and the warp is <2% of pipeline time (it exists only at dataset-prep).

``fused_degrade_normalize`` is numerically validated against the XLA ops
path in interpreter mode and on-device (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crfr.ops.bicubic import degrade_matrix
from crfr.ops.normalize import MEAN, STD


def _kernel(x_ref, w_ref, o_ref):
    # One (image, channel) plane per program: pure 2-D MXU matmuls — the
    # layout Mosaic tiles best (unit dims squeezed, S on sublanes/lanes).
    x = x_ref[0, 0].astype(jnp.float32)           # (S, S)
    w = w_ref[...]                                # (S, S) f32
    t = jnp.dot(w, x, preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(
        t, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # (S, S) = W·X·Wᵀ
    y = (y - MEAN) * (1.0 / STD)
    o_ref[0, 0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("low", "mode", "out_dtype",
                                             "interpret"))
def fused_degrade_normalize(x: jax.Array, low: int, mode: str = "pil",
                            out_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jax.Array:
    """(B, S, S, C) raw pixels → degraded+normalized (B, S, S, C) out_dtype.

    Equivalent to normalize(degrade_updown(x, low, mode)) in one Pallas
    kernel; one grid step per image.
    """
    b, s, s2, c = x.shape
    assert s == s2, "square inputs only"
    w = jnp.asarray(degrade_matrix(s, low, mode))

    xc = jnp.transpose(x, (0, 3, 1, 2))           # NHWC → NCHW (XLA fuses)
    out = pl.pallas_call(
        _kernel,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, s, s), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, s), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, s, s), out_dtype),
        interpret=interpret,
    )(xc, w)
    return jnp.transpose(out, (0, 2, 3, 1))       # back to NHWC


@functools.partial(jax.jit, static_argnames=("out_hw", "mode", "out_dtype",
                                             "interpret"))
def fused_resize_normalize(x: jax.Array, out_hw: tuple[int, int],
                           mode: str = "pil", out_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jax.Array:
    """(B, H, W, C) → resized (B, oh, ow, C), normalized, in one kernel.
    The serving-ingest path: arbitrary input size → 112×112 network input."""
    from crfr.ops.bicubic import resize_matrix

    b, h, w_in, c = x.shape
    oh, ow = out_hw
    wr = jnp.asarray(resize_matrix(h, oh, mode))          # (oh, h)
    wc = jnp.asarray(resize_matrix(w_in, ow, mode))       # (ow, w)

    def kernel(x_ref, wr_ref, wc_ref, o_ref):
        xx = x_ref[0, 0].astype(jnp.float32)              # (h, w)
        t = jnp.dot(wr_ref[...], xx,
                    preferred_element_type=jnp.float32)   # (oh, w)
        y = jax.lax.dot_general(
            t, wc_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (oh, ow)
        y = (y - MEAN) * (1.0 / STD)
        o_ref[0, 0] = y.astype(o_ref.dtype)

    xc = jnp.transpose(x, (0, 3, 1, 2))
    out = pl.pallas_call(
        kernel,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w_in), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((oh, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, w_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, oh, ow), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, oh, ow), out_dtype),
        interpret=interpret,
    )(xc, wr, wc)
    return jnp.transpose(out, (0, 2, 3, 1))
