"""Prior-aided face hallucination networks (SURVEY.md §2.1 "Prior estimator" /
"Face hallucination network", §3.2 call stack) — the paper's FSRNet-style SR
stage: a coarse upsampler, a facial-prior estimator (landmark heatmaps /
parsing maps from an hourglass), a prior-conditioned generator, and a
discriminator for the adversarial loss.

TPU-first choices: NHWC everywhere; upsampling via sub-pixel conv
(conv → depth_to_space — a pure reshape/transpose XLA handles natively,
no transposed-conv striding patterns that tile poorly); GroupNorm-free plain
BN/PReLU matching the recognition stack's compile profile; every network is
a static-shape NNX module jitted as part of the SR train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def _depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """(B, H, W, C·r²) → (B, H·r, W·r, C) — sub-pixel upsample."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


class ConvBlock(nnx.Module):
    def __init__(self, cin, cout, *, kernel=3, stride=1, rngs: nnx.Rngs,
                 dtype=jnp.float32, act: bool = True, norm: bool = True):
        self.conv = nnx.Conv(cin, cout, (kernel, kernel), strides=stride,
                             padding=kernel // 2, use_bias=not norm,
                             dtype=dtype, rngs=rngs)
        from crfr.models.irse import PReLU
        self.bn = nnx.BatchNorm(cout, momentum=0.9, dtype=dtype, rngs=rngs) if norm else None
        self.prelu = PReLU(cout) if act else None

    def __call__(self, x, *, train: bool = False):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x, use_running_average=not train)
        if self.prelu is not None:
            x = self.prelu(x)
        return x


class ResBlock(nnx.Module):
    def __init__(self, ch, *, rngs: nnx.Rngs, dtype=jnp.float32):
        self.c1 = ConvBlock(ch, ch, rngs=rngs, dtype=dtype)
        self.c2 = ConvBlock(ch, ch, rngs=rngs, dtype=dtype, act=False)

    def __call__(self, x, *, train: bool = False):
        return x + self.c2(self.c1(x, train=train), train=train)


class CoarseUpsampler(nnx.Module):
    """LR (B, s, s, 3) → coarse HR (B, s·r, s·r, 3): a fixed bicubic-↑ skip
    plus a learned sub-pixel-conv residual. The skip means the coarse output
    EQUALS bicubic upsampling at init and can only improve on it — the
    standard SR residual-learning trick, and it guarantees the hallucination
    path never starts worse than the plain bicubic probe pipeline.

    Any integer r ≥ 2: ×2 sub-pixel stages for every factor of 2, then one
    final odd-factor sub-pixel stage (e.g. 14 → ×2 ×7; 7 → ×7 — the 112-px
    pipeline's 16- and 8-px probes need scales 7 and 14). Power-of-2 scales
    produce the exact pre-existing module tree (checkpoint-compatible)."""

    def __init__(self, scale: int, width: int = 64, n_res: int = 3, *,
                 rngs: nnx.Rngs, dtype=jnp.float32, bicubic_skip: bool = True,
                 resize_mode: str = "pil"):
        assert scale >= 2, "scale must be an integer >= 2"
        self.scale = scale
        self.bicubic_skip = bicubic_skip
        self.resize_mode = resize_mode
        self.inp = ConvBlock(3, width, rngs=rngs, dtype=dtype)
        self.body = nnx.List([ResBlock(width, rngs=rngs, dtype=dtype)
                              for _ in range(n_res)])
        factors = []
        s = scale
        while s % 2 == 0:
            factors.append(2)
            s //= 2
        if s > 1:
            factors.append(s)
        self.factors = tuple(factors)
        ups = [nnx.Conv(width, width * f * f, (3, 3), padding=1,
                        dtype=dtype, rngs=rngs) for f in factors]
        self.ups = nnx.List(ups)
        self.out = nnx.Conv(width, 3, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        # residual path starts at zero → coarse(x) == bicubic↑(x) at init
        if bicubic_skip:
            self.out.kernel.value = jnp.zeros_like(self.out.kernel.value)
            if self.out.bias is not None:
                self.out.bias.value = jnp.zeros_like(self.out.bias.value)

    def __call__(self, x, *, train: bool = False):
        r = self.inp(x, train=train)
        for blk in self.body:
            r = blk(r, train=train)
        for up, f in zip(self.ups, self.factors):
            r = _depth_to_space(up(r), f)
            r = jax.nn.relu(r)
        r = self.out(r)
        if not self.bicubic_skip:
            return r
        # shapes are static under jit, so the bicubic-↑ operator is computed
        # at trace time and baked as a constant (one matmul pair on-device)
        from crfr.ops.bicubic import resize_matrix
        s_in = x.shape[1]
        w = jnp.asarray(resize_matrix(s_in, s_in * self.scale,
                                      self.resize_mode), r.dtype)
        skip = jnp.einsum("oi,bijc,pj->bopc", w, x.astype(r.dtype), w,
                          preferred_element_type=r.dtype)
        return skip + r


class Hourglass(nnx.Module):
    """One recursive hourglass level-set (encoder–decoder with skip adds)."""

    def __init__(self, depth: int, ch: int, *, rngs: nnx.Rngs, dtype=jnp.float32):
        self.depth = depth
        self.skip = nnx.List([ResBlock(ch, rngs=rngs, dtype=dtype)
                              for _ in range(depth)])
        self.down = nnx.List([ResBlock(ch, rngs=rngs, dtype=dtype)
                              for _ in range(depth)])
        self.up = nnx.List([ResBlock(ch, rngs=rngs, dtype=dtype)
                            for _ in range(depth)])
        self.mid = ResBlock(ch, rngs=rngs, dtype=dtype)

    def __call__(self, x, *, train: bool = False):
        skips = []
        for d in range(self.depth):
            skips.append(self.skip[d](x, train=train))
            x = nnx.max_pool(x, (2, 2), strides=(2, 2))
            x = self.down[d](x, train=train)
        x = self.mid(x, train=train)
        for d in reversed(range(self.depth)):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = self.up[d](x, train=train) + skips[d]
        return x


class PriorEstimator(nnx.Module):
    """Coarse HR face → facial priors: K channels of landmark heatmaps +
    parsing maps, same spatial size as input (FSRNet-style hourglass)."""

    def __init__(self, n_priors: int = 16, width: int = 64, hg_depth: int = 3,
                 *, rngs: nnx.Rngs, dtype=jnp.float32):
        self.inp = ConvBlock(3, width, rngs=rngs, dtype=dtype)
        self.hg = Hourglass(hg_depth, width, rngs=rngs, dtype=dtype)
        self.out = nnx.Conv(width, n_priors, (1, 1), dtype=dtype, rngs=rngs)

    def __call__(self, x, *, train: bool = False):
        h = self.hg(self.inp(x, train=train), train=train)
        return self.out(h)


class Generator(nnx.Module):
    """Fine SR: concat(coarse HR, priors) → residual trunk → HR image.
    Output is coarse + residual (the net learns the correction)."""

    def __init__(self, n_priors: int = 16, width: int = 64, n_res: int = 8, *,
                 rngs: nnx.Rngs, dtype=jnp.float32):
        self.inp = ConvBlock(3 + n_priors, width, rngs=rngs, dtype=dtype)
        self.body = nnx.List([ResBlock(width, rngs=rngs, dtype=dtype)
                              for _ in range(n_res)])
        self.out = nnx.Conv(width, 3, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        # zero-init the correction head: G == coarse at init, so with the
        # coarse net's bicubic skip the whole SR stage starts AT bicubic
        self.out.kernel.value = jnp.zeros_like(self.out.kernel.value)
        if self.out.bias is not None:
            self.out.bias.value = jnp.zeros_like(self.out.bias.value)

    def __call__(self, coarse, priors, *, train: bool = False):
        x = jnp.concatenate([coarse, priors.astype(coarse.dtype)], axis=-1)
        x = self.inp(x, train=train)
        for blk in self.body:
            x = blk(x, train=train)
        return coarse + self.out(x)


class Discriminator(nnx.Module):
    """Strided-conv discriminator → per-image logit (LSGAN-compatible)."""

    def __init__(self, width: int = 64, n_down: int = 4, *, rngs: nnx.Rngs,
                 dtype=jnp.float32):
        layers = [ConvBlock(3, width, stride=2, rngs=rngs, dtype=dtype,
                            norm=False)]
        ch = width
        for _ in range(n_down - 1):
            layers.append(ConvBlock(ch, min(ch * 2, 512), stride=2,
                                    rngs=rngs, dtype=dtype))
            ch = min(ch * 2, 512)
        self.layers = nnx.List(layers)
        self.fc = nnx.Linear(ch, 1, dtype=dtype, rngs=rngs)

    def __call__(self, x, *, train: bool = False):
        for l in self.layers:
            x = l(x, train=train)
        x = jnp.mean(x, axis=(1, 2))            # global average pool
        return self.fc(x)[:, 0]


class Hallucinator(nnx.Module):
    """Full SR stage: LR → coarse → priors → fine HR (+ expose priors for
    the prior-consistency loss)."""

    def __init__(self, scale: int = 8, n_priors: int = 16, *, rngs: nnx.Rngs,
                 dtype=jnp.float32, resize_mode: str = "pil",
                 bicubic_skip: bool = True):
        self.coarse = CoarseUpsampler(scale, rngs=rngs, dtype=dtype,
                                      resize_mode=resize_mode,
                                      bicubic_skip=bicubic_skip)
        self.prior = PriorEstimator(n_priors, rngs=rngs, dtype=dtype)
        self.gen = Generator(n_priors, rngs=rngs, dtype=dtype)

    def __call__(self, lr, *, train: bool = False):
        coarse = self.coarse(lr, train=train)
        priors = self.prior(coarse, train=train)
        sr = self.gen(coarse, priors, train=train)
        return sr, coarse, priors
