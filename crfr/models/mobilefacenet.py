"""MobileFaceNet backbone (Flax NNX) — the reference family's lightweight
embedding model (face.evoLVe ``model_mobilefacenet`` lineage; SURVEY.md §2.1
model zoo breadth).

Inverted-residual bottlenecks with depthwise 3×3s, global depthwise 7×7
instead of pooling, linear 1×1 to the embedding, BN everywhere. NHWC, bf16
compute / f32 params, identical dtype policy to IRBackbone. ~1M params —
the serving-tier counterpart of IR-50/100.

Stage table (t = expansion, c = out channels, n = repeats, s = stride):
    (2, 64, 5, 2), (4, 128, 1, 2), (2, 128, 6, 1), (4, 128, 1, 2),
    (2, 128, 2, 1)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from crfr.models.irse import PReLU

_STAGES = ((2, 64, 5, 2), (4, 128, 1, 2), (2, 128, 6, 1), (4, 128, 1, 2),
           (2, 128, 2, 1))


class ConvBNPReLU(nnx.Module):
    def __init__(self, cin, cout, kernel, stride, *, groups=1, act=True,
                 rngs: nnx.Rngs, dtype=jnp.float32, param_dtype=jnp.float32):
        self.conv = nnx.Conv(cin, cout, (kernel, kernel), strides=stride,
                             padding=kernel // 2, feature_group_count=groups,
                             use_bias=False, dtype=dtype,
                             param_dtype=param_dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(cout, momentum=0.9, epsilon=1e-5, dtype=dtype,
                                param_dtype=param_dtype, rngs=rngs)
        self.prelu = PReLU(cout, param_dtype=param_dtype) if act else None

    def __call__(self, x, *, train: bool = False):
        x = self.bn(self.conv(x), use_running_average=not train)
        return self.prelu(x) if self.prelu is not None else x


class Bottleneck(nnx.Module):
    def __init__(self, cin, cout, expansion, stride, *, rngs: nnx.Rngs,
                 dtype=jnp.float32, param_dtype=jnp.float32):
        mid = cin * expansion
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.expand = ConvBNPReLU(cin, mid, 1, 1, **kw)
        self.depthwise = ConvBNPReLU(mid, mid, 3, stride, groups=mid, **kw)
        self.project = ConvBNPReLU(mid, cout, 1, 1, act=False, **kw)
        self.residual = (stride == 1 and cin == cout)

    def __call__(self, x, *, train: bool = False):
        y = self.expand(x, train=train)
        y = self.depthwise(y, train=train)
        y = self.project(y, train=train)
        return x + y if self.residual else y


class MobileFaceNet(nnx.Module):
    """112×112×3 → embedding_dim (512 by default, 128 canonical)."""

    def __init__(self, embedding_dim: int = 512, input_size: int = 112, *,
                 rngs: nnx.Rngs, dtype=jnp.bfloat16,
                 param_dtype=jnp.float32):
        if input_size % 16 != 0:
            raise ValueError("input_size must be divisible by 16")
        kw = dict(rngs=rngs, dtype=dtype, param_dtype=param_dtype)
        self.dtype = dtype
        self.stem = ConvBNPReLU(3, 64, 3, 2, **kw)
        self.stem_dw = ConvBNPReLU(64, 64, 3, 1, groups=64, **kw)
        blocks = []
        cin = 64
        for t, c, n, s in _STAGES:
            for i in range(n):
                blocks.append(Bottleneck(cin, c, t, s if i == 0 else 1, **kw))
                cin = c
        self.blocks = nnx.List(blocks)
        self.head_conv = ConvBNPReLU(cin, 512, 1, 1, **kw)
        feat = input_size // 16
        # global depthwise conv over the full feature map (GDConv)
        self.gdconv = nnx.Conv(512, 512, (feat, feat), padding="VALID",
                               feature_group_count=512, use_bias=False,
                               dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.gd_bn = nnx.BatchNorm(512, momentum=0.9, epsilon=1e-5,
                                   dtype=dtype, param_dtype=param_dtype,
                                   rngs=rngs)
        self.out_linear = nnx.Linear(512, embedding_dim, use_bias=False,
                                     dtype=dtype, param_dtype=param_dtype,
                                     rngs=rngs)
        self.out_bn = nnx.BatchNorm(embedding_dim, momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32,
                                    param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        x = self.stem(x, train=train)
        x = self.stem_dw(x, train=train)
        for blk in self.blocks:
            x = blk(x, train=train)
        x = self.head_conv(x, train=train)
        x = self.gdconv(x)
        x = self.gd_bn(x, use_running_average=not train)
        x = x.reshape(x.shape[0], -1)
        x = self.out_linear(x)
        return self.out_bn(x.astype(jnp.float32),
                           use_running_average=not train)
