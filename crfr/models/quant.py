"""Post-training int8 quantization of the embedding backbones — the serving
throughput lever beyond the bf16 roofline.

TPU v5e's MXU runs s8×s8→s32 at twice the bf16 FLOP rate (394 TOPS vs
197 TFLOP/s peak; measured on this chip with an in-jit conv chain:
287 TOPS vs 178 TFLOP/s on a 3×3/128-channel conv — 1.6× end to end).
Since convolutions are 98.8% of embed-path device time (BASELINE.md
§XProf) and the bf16 path already sits at its roofline, int8 inference is
the one remaining speedup that does not change the architecture.

The reference family has no quantized path (SURVEY.md §2.2: all native
compute vendored in torch/cv2 wheels, f32/cuda); this is a rebuild-side
production-serving extra, kept strictly out of the training/parity paths.

Scheme — standard symmetric PTQ, chosen so nothing accuracy-critical moves:
- **weights**: per-output-channel symmetric int8 (absmax/127). At 8 bits
  per-channel, conv kernels lose nothing measurable.
- **activations**: per-tensor symmetric int8; the scale is calibrated as
  the maximum |x| each conv's input attains over calibration batches
  (collected by jitted observer forwards, see ``calibrate``).
- the conv computes s8×s8→s32 on the MXU, then one fused multiply
  (``sx·sw[c]``) requantizes to the float compute dtype.
- everything else — BN affines, PReLU, SE, residual adds, the final
  Linear+BN head — stays bf16/f32: VPU ops XLA fuses into conv epilogues,
  <2% of FLOPs, and the numerically sensitive tail (feature BN) keeps
  full precision.
- depthwise/grouped convs (``feature_group_count > 1``, MobileFaceNet) are
  left in float: they are bandwidth-, not MXU-bound, so int8 buys nothing.

Usage::

    qbb = quantize_backbone(trainer.model.backbone, calib_batches)
    embed = jax.jit(lambda x: qbb(x, train=False))      # drop-in

The quantized module is pure/jittable and slots into ``make_extract_fn``,
``build_serving_fn`` and ``export_embed`` unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax import lax


def _pair(v) -> tuple:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _canon_padding(padding, n_spatial: int = 2):
    """nnx.Conv padding (int | str | seq) → lax.conv padding config."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * n_spatial
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


class QuantConv(nnx.Module):
    """int8-weight / int8-activation replacement for an ``nnx.Conv``.

    Built FROM a trained float conv plus a calibrated input absmax;
    computes s8×s8→s32 on the MXU and requantizes with one multiply.
    """

    def __init__(self, conv: nnx.Conv, act_absmax: float):
        k = jnp.asarray(conv.kernel[...], jnp.float32)          # HWIO
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
        self.w8 = nnx.Variable(
            jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8))
        self.sw = nnx.Variable(sw)                              # (O,)
        self.sx = nnx.Variable(
            jnp.asarray(max(float(act_absmax), 1e-12) / 127.0, jnp.float32))
        self.bias = (nnx.Variable(jnp.asarray(conv.bias[...], jnp.float32))
                     if conv.use_bias else None)
        self._strides = _pair(conv.strides)
        self._padding = _canon_padding(conv.padding)
        self._dilation = _pair(conv.kernel_dilation)
        self._out_dtype = conv.dtype or jnp.float32

    def __call__(self, x):
        sx = self.sx[...]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, self.w8[...], self._strides, self._padding,
            rhs_dilation=self._dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (sx * self.sw[...])
        if self.bias is not None:
            out = out + self.bias[...]
        return out.astype(self._out_dtype)


class _ObserverConv(nnx.Module):
    """Forward-through wrapper recording the input's absmax (jit-safe:
    the running max lives in a BatchStat, mutated under nnx state rules)."""

    def __init__(self, conv: nnx.Conv):
        self.conv = conv
        self.absmax = nnx.BatchStat(jnp.zeros((), jnp.float32))

    def __call__(self, x):
        self.absmax[...] = jnp.maximum(
            self.absmax[...], jnp.max(jnp.abs(x.astype(jnp.float32))))
        return self.conv(x)


def _walk_convs(node: nnx.Module, fn: Callable[[str, nnx.Conv], nnx.Module],
                path: str = "", _seen: set | None = None) -> None:
    """Replace every eligible nnx.Conv reachable from ``node`` (recursing
    through module attributes and nnx.List containers) with ``fn(path, c)``."""
    seen = _seen if _seen is not None else set()
    if id(node) in seen:
        return
    seen.add(id(node))
    if isinstance(node, (nnx.List,)):
        for i, child in enumerate(list(node)):
            if isinstance(child, nnx.Conv):
                if child.feature_group_count == 1:
                    node[i] = fn(f"{path}[{i}]", child)
            elif isinstance(child, nnx.Module):
                _walk_convs(child, fn, f"{path}[{i}]", seen)
        return
    for name, child in list(vars(node).items()):
        if name.startswith("_"):
            continue
        if isinstance(child, nnx.Conv):
            if child.feature_group_count == 1:
                setattr(node, name, fn(f"{path}.{name}".lstrip("."), child))
        elif isinstance(child, nnx.Module):
            _walk_convs(child, fn, f"{path}.{name}".lstrip("."), seen)


def calibrate(model: nnx.Module,
              calib_batches: Iterable[np.ndarray] | Sequence[np.ndarray],
              ) -> dict[str, float]:
    """Run observer forwards over ``calib_batches`` (normalized pixels,
    NHWC f32) and return {conv_path: input_absmax}. ``model`` is mutated
    (convs wrapped) — pass a throwaway clone."""
    observers: dict[str, _ObserverConv] = {}

    def wrap(path, conv):
        obs = _ObserverConv(conv)
        observers[path] = obs
        return obs

    _walk_convs(model, wrap)
    if not observers:
        raise ValueError("no quantizable convs found in model")

    @nnx.jit
    def fwd(m, x):
        return m(x, train=False)

    n = 0
    for batch in calib_batches:
        fwd(model, jnp.asarray(batch))
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {p: float(jax.device_get(o.absmax[...]))
            for p, o in observers.items()}


def quantize_backbone(backbone: nnx.Module,
                      calib_batches: Iterable[np.ndarray],
                      ) -> nnx.Module:
    """Clone ``backbone`` and return the int8-conv version.

    ``calib_batches``: a few batches of NORMALIZED pixels ((x−127.5)/128,
    NHWC) representative of serving traffic — typically 1–4 batches of the
    eval set; scales are absmax so more data only widens them.
    """
    calib_model = nnx.clone(backbone)
    scales = calibrate(calib_model, calib_batches)

    qmodel = nnx.clone(backbone)
    _walk_convs(qmodel, lambda path, conv: QuantConv(conv, scales[path]))
    return qmodel


def quantized_embed_fn(backbone: nnx.Module,
                       calib_batches: Iterable[np.ndarray]) -> Callable:
    """One-call convenience: trained float backbone → jitted int8 embed
    callable (normalized pixels → embeddings)."""
    qbb = quantize_backbone(backbone, calib_batches)
    graphdef, state = nnx.split(qbb)

    @jax.jit
    def f(x):
        return nnx.merge(graphdef, state)(x, train=False)

    return f
