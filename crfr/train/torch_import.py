"""Torch state_dict ↔ crfr pytree weight import (SURVEY.md §5.4).

Purpose: load real reference-family weights (face.evoLVe / insightface
``IR_50``-style checkpoints) into ``crfr.models.irse.IRBackbone`` — for
parity testing against torch twins today, and for importing the actual
reference checkpoints the day the mount works.

The face.evoLVe module layout (its ``model_irse.py`` naming convention) is:

    input_layer.0/1/2           Conv, BN, PReLU
    body.<i>.res_layer.0..4     BN, Conv, PReLU, Conv, BN   (+5/6 SE convs)
    body.<i>.shortcut_layer.0/1 Conv, BN                    (when present)
    output_layer.0/3/4          BN2d, Linear, BN1d
    (output_layer.1/2 are Dropout/Flatten — stateless)

Conversions: torch conv (O,I,kh,kw) → flax (kh,kw,I,O); torch linear (O,I) →
flax (I,O); the flatten before output_layer.3 is NCHW in torch vs NHWC here,
so the linear's input dim is PERMUTED accordingly (512·7·7 blocks reordered),
handled by ``_permute_flatten_linear``. BN running stats map to mean/var.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np
from flax import nnx

from crfr.models.irse import IRBackbone


def _t(x) -> np.ndarray:
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def _set_conv(conv: nnx.Conv, w) -> None:
    conv.kernel.value = jnp.asarray(np.transpose(_t(w), (2, 3, 1, 0)))


def _set_bn(bn: nnx.BatchNorm, sd: Mapping, prefix: str) -> None:
    bn.scale.value = jnp.asarray(_t(sd[f"{prefix}.weight"]))
    bn.bias.value = jnp.asarray(_t(sd[f"{prefix}.bias"]))
    bn.mean.value = jnp.asarray(_t(sd[f"{prefix}.running_mean"]))
    bn.var.value = jnp.asarray(_t(sd[f"{prefix}.running_var"]))


def _permute_flatten_linear(w_torch: np.ndarray, c: int, h: int,
                            w_: int) -> np.ndarray:
    """torch Linear weight (O, C·H·W in NCHW-flat order) → flax kernel
    (H·W·C NHWC-flat order, O)."""
    o = w_torch.shape[0]
    w4 = w_torch.reshape(o, c, h, w_)
    w4 = np.transpose(w4, (2, 3, 1, 0))          # (H, W, C, O)
    return w4.reshape(h * w_ * c, o)


def load_face_evolve_state_dict(model: IRBackbone, sd: Mapping) -> IRBackbone:
    """In-place import of a face.evoLVe-convention IR/IR-SE state_dict."""
    _set_conv(model.input_conv, sd["input_layer.0.weight"])
    _set_bn(model.input_bn, sd, "input_layer.1")
    model.input_prelu.alpha.value = jnp.asarray(_t(sd["input_layer.2.weight"]))

    for i, blk in enumerate(model.blocks):
        p = f"body.{i}"
        _set_bn(blk.bn0, sd, f"{p}.res_layer.0")
        _set_conv(blk.conv1, sd[f"{p}.res_layer.1.weight"])
        blk.prelu.alpha.value = jnp.asarray(_t(sd[f"{p}.res_layer.2.weight"]))
        _set_conv(blk.conv2, sd[f"{p}.res_layer.3.weight"])
        _set_bn(blk.bn2, sd, f"{p}.res_layer.4")
        if blk.se is not None:
            # face.evoLVe SEModule: fc1/fc2 are 1×1 convs (res_layer.5.fc1…)
            for name, lin in (("fc1", blk.se.fc1), ("fc2", blk.se.fc2)):
                key = f"{p}.res_layer.5.{name}.weight"
                w = _t(sd[key])
                if w.ndim == 4:                  # conv1x1 (O,I,1,1)
                    w = w[:, :, 0, 0]
                lin.kernel.value = jnp.asarray(w.T)
        if blk.shortcut_conv is not None:
            _set_conv(blk.shortcut_conv, sd[f"{p}.shortcut_layer.0.weight"])
            _set_bn(blk.shortcut_bn, sd, f"{p}.shortcut_layer.1")

    _set_bn(model.out_bn, sd, "output_layer.0")
    w_lin = _t(sd["output_layer.3.weight"])
    feat = int(np.sqrt(w_lin.shape[1] // 512))
    model.out_linear.kernel.value = jnp.asarray(
        _permute_flatten_linear(w_lin, 512, feat, feat))
    model.out_linear.bias.value = jnp.asarray(_t(sd["output_layer.3.bias"]))
    _set_bn(model.out_feat_bn, sd, "output_layer.4")
    return model


def export_face_evolve_state_dict(model: IRBackbone) -> dict[str, np.ndarray]:
    """Inverse mapping: our backbone → face.evoLVe-convention numpy dict
    (usable to hand weights back to a torch reference for cross-checks)."""
    sd: dict[str, np.ndarray] = {}

    def conv(key, c: nnx.Conv):
        sd[key] = np.transpose(np.asarray(c.kernel.value), (3, 2, 0, 1))

    def bn(prefix, b: nnx.BatchNorm):
        sd[f"{prefix}.weight"] = np.asarray(b.scale.value)
        sd[f"{prefix}.bias"] = np.asarray(b.bias.value)
        sd[f"{prefix}.running_mean"] = np.asarray(b.mean.value)
        sd[f"{prefix}.running_var"] = np.asarray(b.var.value)

    conv("input_layer.0.weight", model.input_conv)
    bn("input_layer.1", model.input_bn)
    sd["input_layer.2.weight"] = np.asarray(model.input_prelu.alpha.value)
    for i, blk in enumerate(model.blocks):
        p = f"body.{i}"
        bn(f"{p}.res_layer.0", blk.bn0)
        conv(f"{p}.res_layer.1.weight", blk.conv1)
        sd[f"{p}.res_layer.2.weight"] = np.asarray(blk.prelu.alpha.value)
        conv(f"{p}.res_layer.3.weight", blk.conv2)
        bn(f"{p}.res_layer.4", blk.bn2)
        if blk.se is not None:
            sd[f"{p}.res_layer.5.fc1.weight"] = np.asarray(
                blk.se.fc1.kernel.value).T
            sd[f"{p}.res_layer.5.fc2.weight"] = np.asarray(
                blk.se.fc2.kernel.value).T
        if blk.shortcut_conv is not None:
            conv(f"{p}.shortcut_layer.0.weight", blk.shortcut_conv)
            bn(f"{p}.shortcut_layer.1", blk.shortcut_bn)
    bn("output_layer.0", model.out_bn)
    k = np.asarray(model.out_linear.kernel.value)          # (HWC, O)
    feat = int(np.sqrt(k.shape[0] // 512))
    k4 = k.reshape(feat, feat, 512, k.shape[1])
    sd["output_layer.3.weight"] = np.transpose(k4, (3, 2, 0, 1)).reshape(
        k.shape[1], -1)
    sd["output_layer.3.bias"] = np.asarray(model.out_linear.bias.value)
    bn("output_layer.4", model.out_feat_bn)
    return sd
