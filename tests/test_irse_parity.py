"""IR backbone numerical parity vs an independent torch-CPU twin.

The twin is written here from the same architectural equations as
crfr/models/irse.py (face.evoLVe-lineage bottleneck_IR), NOT imported from
anywhere — SURVEY.md §4 test pyramid item 1. Weights are copied JAX→torch and
outputs compared in f32 eval mode.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp
from flax import nnx

from crfr.models.irse import IRBackbone


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, out_ch, stride, use_se=False):
        super().__init__()
        self.bn0 = tnn.BatchNorm2d(in_ch)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, 1, 1, bias=False)
        self.prelu = tnn.PReLU(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.use_se = use_se
        if use_se:
            self.se_fc1 = tnn.Linear(out_ch, out_ch // 16, bias=False)
            self.se_fc2 = tnn.Linear(out_ch // 16, out_ch, bias=False)
        if in_ch == out_ch and stride == 1:
            self.short = None
        else:
            self.short = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch))

    def forward(self, x):
        r = self.bn2(self.conv2(self.prelu(self.conv1(self.bn0(x)))))
        if self.use_se:
            s = r.mean(dim=(2, 3))
            s = torch.sigmoid(self.se_fc2(torch.relu(self.se_fc1(s))))
            r = r * s[:, :, None, None]
        sc = x if self.short is None else self.short(x)
        return r + sc


class TorchIR(tnn.Module):
    def __init__(self, stages, use_se=False, emb=512, input_size=112):
        super().__init__()
        self.inp = tnn.Sequential(tnn.Conv2d(3, 64, 3, 1, 1, bias=False),
                                  tnn.BatchNorm2d(64), tnn.PReLU(64))
        blocks, in_ch = [], 64
        for ch, units in stages:
            for u in range(units):
                blocks.append(TorchBottleneck(in_ch, ch, 2 if u == 0 else 1,
                                              use_se))
                in_ch = ch
        self.blocks = tnn.ModuleList(blocks)
        feat = input_size // 16
        self.out_bn = tnn.BatchNorm2d(512)
        self.out_fc = tnn.Linear(512 * feat * feat, emb)
        self.out_feat_bn = tnn.BatchNorm1d(emb)

    def forward(self, x):
        x = self.inp(x)
        for b in self.blocks:
            x = b(x)
        x = self.out_bn(x)
        # NCHW flatten must match NHWC flatten in JAX: permute to NHWC first.
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        return self.out_feat_bn(self.out_fc(x))


def _copy_conv(tconv, jconv):
    k = np.asarray(jconv.kernel.value)          # (kh, kw, in, out)
    tconv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())


def _copy_bn(tbn, jbn):
    tbn.weight.data = torch.from_numpy(np.asarray(jbn.scale.value).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(jbn.bias.value).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(jbn.mean.value).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(jbn.var.value).copy())


def _copy_prelu(tp, jp):
    tp.weight.data = torch.from_numpy(np.asarray(jp.alpha.value).copy())


def _copy_linear(tl, jl):
    k = np.asarray(jl.kernel.value)             # (in, out)
    tl.weight.data = torch.from_numpy(k.T.copy())
    if jl.bias is not None and tl.bias is not None:
        tl.bias.data = torch.from_numpy(np.asarray(jl.bias.value).copy())


def _flax_flatten_matches_torch():
    """JAX flattens NHWC; the twin permutes NCHW→NHWC before flatten, so the
    out_fc weight copies over unchanged."""


@pytest.mark.parametrize("use_se", [False, True])
def test_ir_parity_small(use_se):
    """Tiny 2-stage-deep IR (depth '18') f32 parity, atol 1e-3 abs on 512-d."""
    stages = [(64, 2), (128, 2), (256, 2), (512, 2)]
    jm = IRBackbone(depth="18", use_se=use_se, dtype=jnp.float32, rngs=nnx.Rngs(3))
    # Randomize BN stats so eval-mode normalization is actually exercised.
    rng = np.random.default_rng(7)
    for _, m in nnx.iter_graph(jm):
        if isinstance(m, nnx.BatchNorm):
            n = m.mean.value.shape[0]
            m.mean.value = jnp.asarray(rng.normal(0, 0.5, n), jnp.float32)
            m.var.value = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
            m.scale.value = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
            m.bias.value = jnp.asarray(rng.normal(0, 0.2, n), jnp.float32)

    tm = TorchIR(stages, use_se=use_se)
    _copy_conv(tm.inp[0], jm.input_conv)
    _copy_bn(tm.inp[1], jm.input_bn)
    _copy_prelu(tm.inp[2], jm.input_prelu)
    for tb, jb in zip(tm.blocks, jm.blocks):
        _copy_bn(tb.bn0, jb.bn0)
        _copy_conv(tb.conv1, jb.conv1)
        _copy_prelu(tb.prelu, jb.prelu)
        _copy_conv(tb.conv2, jb.conv2)
        _copy_bn(tb.bn2, jb.bn2)
        if use_se:
            _copy_linear(tb.se_fc1, jb.se.fc1)
            _copy_linear(tb.se_fc2, jb.se.fc2)
        if tb.short is not None:
            _copy_conv(tb.short[0], jb.shortcut_conv)
            _copy_bn(tb.short[1], jb.shortcut_bn)
    _copy_bn(tm.out_bn, jm.out_bn)
    _copy_linear(tm.out_fc, jm.out_linear)
    _copy_bn(tm.out_feat_bn, jm.out_feat_bn)
    tm.eval()

    x = rng.normal(0, 1, size=(2, 112, 112, 3)).astype(np.float32)
    jout = np.asarray(jm(jnp.asarray(x), train=False))
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    assert jout.shape == (2, 512)
    np.testing.assert_allclose(jout, tout, atol=2e-3, rtol=1e-3)


def test_ir50_shapes():
    jm = IRBackbone(depth="50", dtype=jnp.float32, rngs=nnx.Rngs(0))
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    out = jm(x, train=False)
    assert out.shape == (2, 512)
    assert out.dtype == jnp.float32
