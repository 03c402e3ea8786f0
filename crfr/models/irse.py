"""IR / IR-SE embedding backbones (Flax NNX) — the recognition model zoo.

Re-implements, TPU-first, the improved-residual ("IR") ResNet family the
BASELINE contract names ("IR/ResNet-style embedding backbone … identical 512-d
embedding outputs"): the face.evoLVe / insightface lineage architecture
(SURVEY.md §2.1 "Embedding backbone"):

  input : Conv3×3(3→64, s1) → BN → PReLU                      (112×112×64)
  body  : 4 stages of bottleneck_IR(_SE) units, stage strides 2
          unit: BN → Conv3×3(s1) → PReLU → Conv3×3(s_unit) → BN [→ SE]
          shortcut: identity (same ch, s1) or Conv1×1(s)+BN
  output: BN → Dropout → Flatten → Linear(512·7·7 → 512) → BN1d (7×7 tail)

Depth configs: ir_18/34/50/100/152 (+ ``_se`` suffix for squeeze-excite).

TPU-native choices:
- NHWC layout end-to-end (XLA:TPU's native conv layout; channels ride the
  128-lane axis).
- bf16 compute / f32 params & BN statistics via flax dtype policy — conv
  FLOPs hit the MXU in bf16, normalization stays stable in f32.
- No data-dependent control flow; a whole forward is one traced graph.
- PReLU as a per-channel vector broadcast (VPU-friendly, fuses into the
  preceding conv's epilogue under XLA).

Numerical parity with a from-equations torch-CPU twin is enforced in
tests/test_irse_parity.py (weights copied both ways, atol ~1e-4 f32).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import nnx


@dataclass(frozen=True)
class _StageSpec:
    channels: int
    units: int


_DEPTH_CONFIGS: dict[str, tuple[_StageSpec, ...]] = {
    "18": (_StageSpec(64, 2), _StageSpec(128, 2), _StageSpec(256, 2), _StageSpec(512, 2)),
    "34": (_StageSpec(64, 3), _StageSpec(128, 4), _StageSpec(256, 6), _StageSpec(512, 3)),
    "50": (_StageSpec(64, 3), _StageSpec(128, 4), _StageSpec(256, 14), _StageSpec(512, 3)),
    "100": (_StageSpec(64, 3), _StageSpec(128, 13), _StageSpec(256, 30), _StageSpec(512, 3)),
    "152": (_StageSpec(64, 3), _StageSpec(128, 8), _StageSpec(256, 36), _StageSpec(512, 3)),
}


class PReLU(nnx.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(ch) semantics, init 0.25)."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32):
        self.alpha = nnx.Param(jnp.full((channels,), 0.25, dtype=param_dtype))

    def __call__(self, x):
        alpha = self.alpha.value.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class SEModule(nnx.Module):
    """Squeeze-and-excite: GAP → FC(c/r) → ReLU → FC(c) → sigmoid gate."""

    def __init__(self, channels: int, reduction: int, *, rngs: nnx.Rngs,
                 dtype=jnp.float32, param_dtype=jnp.float32):
        self.fc1 = nnx.Linear(channels, channels // reduction, use_bias=False,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc2 = nnx.Linear(channels // reduction, channels, use_bias=False,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))                  # NHWC → (N, C)
        s = nnx.relu(self.fc1(s))
        s = nnx.sigmoid(self.fc2(s))
        return x * s[:, None, None, :].astype(x.dtype)


class BottleneckIR(nnx.Module):
    """BN → Conv3×3 → PReLU → Conv3×3(stride) → BN (+SE), plus shortcut."""

    def __init__(self, in_ch: int, out_ch: int, stride: int, use_se: bool, *,
                 rngs: nnx.Rngs, dtype=jnp.float32, param_dtype=jnp.float32):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.bn0 = nnx.BatchNorm(in_ch, momentum=0.9, epsilon=1e-5, **kw)
        self.conv1 = nnx.Conv(in_ch, out_ch, (3, 3), strides=1, padding=1,
                              use_bias=False, **kw)
        self.prelu = PReLU(out_ch, param_dtype=param_dtype)
        self.conv2 = nnx.Conv(out_ch, out_ch, (3, 3), strides=stride, padding=1,
                              use_bias=False, **kw)
        self.bn2 = nnx.BatchNorm(out_ch, momentum=0.9, epsilon=1e-5, **kw)
        self.se = (SEModule(out_ch, 16, **kw) if use_se else None)
        if in_ch == out_ch and stride == 1:
            self.shortcut_conv = None
            self.shortcut_bn = None
        else:
            self.shortcut_conv = nnx.Conv(in_ch, out_ch, (1, 1), strides=stride,
                                          use_bias=False, **kw)
            self.shortcut_bn = nnx.BatchNorm(out_ch, momentum=0.9, epsilon=1e-5, **kw)

    def __call__(self, x, *, train: bool = False):
        r = self.bn0(x, use_running_average=not train)
        r = self.conv1(r)
        r = self.prelu(r)
        r = self.conv2(r)
        r = self.bn2(r, use_running_average=not train)
        if self.se is not None:
            r = self.se(r)
        if self.shortcut_conv is not None:
            x = self.shortcut_bn(self.shortcut_conv(x),
                                 use_running_average=not train)
        return r + x


class IRBackbone(nnx.Module):
    """IR/IR-SE backbone: 112×112×3 NHWC uint8-normalized input → 512-d f32
    embedding. L2 normalization is applied at use-time (eval/head), not here,
    matching the reference-family convention."""

    def __init__(self, depth: str = "50", use_se: bool = False,
                 embedding_dim: int = 512, dropout: float = 0.4,
                 input_size: int = 112, remat: bool = False, *,
                 rngs: nnx.Rngs, dtype=jnp.bfloat16, param_dtype=jnp.float32):
        if depth not in _DEPTH_CONFIGS:
            raise ValueError(f"depth {depth!r} not in {sorted(_DEPTH_CONFIGS)}")
        if input_size % 16 != 0:
            raise ValueError("input_size must be divisible by 16")
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dtype = dtype
        self.input_conv = nnx.Conv(3, 64, (3, 3), strides=1, padding=1,
                                   use_bias=False, **kw)
        self.input_bn = nnx.BatchNorm(64, momentum=0.9, epsilon=1e-5, **kw)
        self.input_prelu = PReLU(64, param_dtype=param_dtype)

        blocks = []
        in_ch = 64
        stage_ends = []
        for spec in _DEPTH_CONFIGS[depth]:
            for u in range(spec.units):
                blocks.append(BottleneckIR(
                    in_ch, spec.channels, stride=2 if u == 0 else 1,
                    use_se=use_se, **kw))
                in_ch = spec.channels
            stage_ends.append(len(blocks))
        self.blocks = nnx.List(blocks)
        self._stage_ends = tuple(stage_ends)   # block index after each stage
        # jax.checkpoint each residual block on backward (ModelCfg.remat):
        # activation HBM drops from O(depth) to O(1) blocks at ~1/3 extra
        # forward FLOPs — how IR-152/b1024 fits a fixed-HBM chip.
        self._remat = remat

        feat = input_size // 16
        self.out_bn = nnx.BatchNorm(512, momentum=0.9, epsilon=1e-5, **kw)
        self.out_dropout = nnx.Dropout(dropout, rngs=rngs)
        self.out_linear = nnx.Linear(512 * feat * feat, embedding_dim,
                                     use_bias=True, dtype=dtype,
                                     param_dtype=param_dtype, rngs=rngs)
        # Final feature BN ("BN1d"): affine, tracks running stats.
        self.out_feat_bn = nnx.BatchNorm(embedding_dim, momentum=0.9,
                                         epsilon=1e-5, use_bias=True,
                                         use_scale=True, dtype=jnp.float32,
                                         param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        x = self.input_prelu(self.input_bn(self.input_conv(x),
                                           use_running_average=not train))
        if self._remat and train:
            call = nnx.remat(lambda m, h: m(h, train=True))
        else:
            call = lambda m, h: m(h, train=train)   # noqa: E731
        for blk in self.blocks:
            x = call(blk, x)
        x = self.out_bn(x, use_running_average=not train)
        x = self.out_dropout(x, deterministic=not train)
        x = x.reshape(x.shape[0], -1)
        x = self.out_linear(x)
        x = self.out_feat_bn(x.astype(jnp.float32), use_running_average=not train)
        return x

    def features(self, x, *, train: bool = False) -> list:
        """Stage-boundary feature maps (one per spatial scale, finest →
        coarsest) — the taps for recognition-feature perceptual losses
        (the TPU-native, download-free stand-in for VGG features)."""
        x = x.astype(self.dtype)
        x = self.input_prelu(self.input_bn(self.input_conv(x),
                                           use_running_average=not train))
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x, train=train)
            if i + 1 in self._stage_ends:
                feats.append(x)
        return feats


def build_backbone(name: str = "ir_50", *, embedding_dim: int = 512,
                   dropout: float = 0.4, input_size: int = 112,
                   remat: bool = False, rngs: nnx.Rngs | None = None,
                   dtype=jnp.bfloat16, param_dtype=jnp.float32):
    """Factory: 'ir_50' / 'ir_se_101' → IRBackbone; 'mobilefacenet' →
    MobileFaceNet."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    parts = name.lower().split("_")
    if parts[0] == "mobilefacenet":
        from crfr.models.mobilefacenet import MobileFaceNet
        return MobileFaceNet(embedding_dim=embedding_dim,
                             input_size=input_size, rngs=rngs, dtype=dtype,
                             param_dtype=param_dtype)
    if parts[0] != "ir":
        raise ValueError(f"unknown backbone {name!r}")
    use_se = "se" in parts
    depth = parts[-1]
    if depth == "101":          # face.evoLVe calls the [3,13,30,3] config 101
        depth = "100"
    return IRBackbone(depth=depth, use_se=use_se, embedding_dim=embedding_dim,
                      dropout=dropout, input_size=input_size, remat=remat,
                      rngs=rngs, dtype=dtype, param_dtype=param_dtype)
