"""MobileFaceNet parity vs torch twin; insightface .bin roundtrip + eval."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp
from flax import nnx

from crfr.models.mobilefacenet import MobileFaceNet
from crfr.models.irse import build_backbone


class TBottleneck(tnn.Module):
    def __init__(self, cin, cout, t, s):
        super().__init__()
        mid = cin * t
        self.expand = tnn.Sequential(tnn.Conv2d(cin, mid, 1, bias=False),
                                     tnn.BatchNorm2d(mid), tnn.PReLU(mid))
        self.dw = tnn.Sequential(
            tnn.Conv2d(mid, mid, 3, s, 1, groups=mid, bias=False),
            tnn.BatchNorm2d(mid), tnn.PReLU(mid))
        self.proj = tnn.Sequential(tnn.Conv2d(mid, cout, 1, bias=False),
                                   tnn.BatchNorm2d(cout))
        self.res = (s == 1 and cin == cout)

    def forward(self, x):
        y = self.proj(self.dw(self.expand(x)))
        return x + y if self.res else y


class TMobileFaceNet(tnn.Module):
    def __init__(self, emb=512, size=112):
        super().__init__()
        stages = ((2, 64, 5, 2), (4, 128, 1, 2), (2, 128, 6, 1),
                  (4, 128, 1, 2), (2, 128, 2, 1))
        self.stem = tnn.Sequential(tnn.Conv2d(3, 64, 3, 2, 1, bias=False),
                                   tnn.BatchNorm2d(64), tnn.PReLU(64))
        self.stem_dw = tnn.Sequential(
            tnn.Conv2d(64, 64, 3, 1, 1, groups=64, bias=False),
            tnn.BatchNorm2d(64), tnn.PReLU(64))
        blocks, cin = [], 64
        for t, c, n, s in stages:
            for i in range(n):
                blocks.append(TBottleneck(cin, c, t, s if i == 0 else 1))
                cin = c
        self.blocks = tnn.ModuleList(blocks)
        self.head = tnn.Sequential(tnn.Conv2d(cin, 512, 1, bias=False),
                                   tnn.BatchNorm2d(512), tnn.PReLU(512))
        feat = size // 16
        self.gd = tnn.Conv2d(512, 512, feat, groups=512, bias=False)
        self.gd_bn = tnn.BatchNorm2d(512)
        self.fc = tnn.Linear(512, emb, bias=False)
        self.fc_bn = tnn.BatchNorm1d(emb)

    def forward(self, x):
        x = self.stem_dw(self.stem(x))
        for b in self.blocks:
            x = b(x)
        x = self.head(x)
        x = self.gd_bn(self.gd(x))
        x = x.flatten(1)
        return self.fc_bn(self.fc(x))


def _copy_conv(t, j):
    k = np.asarray(j.kernel.value)          # (kh,kw,in/groups,out)
    t.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())


def _copy_bn(t, j):
    t.weight.data = torch.from_numpy(np.asarray(j.scale.value).copy())
    t.bias.data = torch.from_numpy(np.asarray(j.bias.value).copy())
    t.running_mean.data = torch.from_numpy(np.asarray(j.mean.value).copy())
    t.running_var.data = torch.from_numpy(np.asarray(j.var.value).copy())


def _copy_cbp(tseq, jmod):
    _copy_conv(tseq[0], jmod.conv)
    _copy_bn(tseq[1], jmod.bn)
    if jmod.prelu is not None:
        tseq[2].weight.data = torch.from_numpy(
            np.asarray(jmod.prelu.alpha.value).copy())


def test_mobilefacenet_torch_parity(rng):
    jm = MobileFaceNet(embedding_dim=512, dtype=jnp.float32,
                       rngs=nnx.Rngs(0))
    # randomize BN stats for a meaningful eval-mode check
    for _, m in nnx.iter_graph(jm):
        if isinstance(m, nnx.BatchNorm):
            n = m.mean.value.shape[0]
            m.mean.value = jnp.asarray(rng.normal(0, 0.3, n), jnp.float32)
            m.var.value = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)

    tm = TMobileFaceNet()
    _copy_cbp(tm.stem, jm.stem)
    _copy_cbp(tm.stem_dw, jm.stem_dw)
    for tb, jb in zip(tm.blocks, jm.blocks):
        _copy_cbp(tb.expand, jb.expand)
        _copy_cbp(tb.dw, jb.depthwise)
        _copy_conv(tb.proj[0], jb.project.conv)
        _copy_bn(tb.proj[1], jb.project.bn)
    _copy_cbp(tm.head, jm.head_conv)
    _copy_conv(tm.gd, jm.gdconv)
    _copy_bn(tm.gd_bn, jm.gd_bn)
    tm.fc.weight.data = torch.from_numpy(
        np.asarray(jm.out_linear.kernel.value).T.copy())
    _copy_bn(tm.fc_bn, jm.out_bn)
    tm.eval()

    x = rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    jout = np.asarray(jm(jnp.asarray(x), train=False))
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    assert jout.shape == (2, 512)
    np.testing.assert_allclose(jout, tout, atol=2e-3, rtol=1e-3)


def test_factory_dispatch():
    m = build_backbone("mobilefacenet", dtype=jnp.float32, rngs=nnx.Rngs(0))
    out = m(jnp.zeros((2, 112, 112, 3)), train=False)
    assert out.shape == (2, 512)


# ------------------------------ .bin ---------------------------------------


def test_cli_eval_bin(tmp_path, cli_ckpt, capsys):
    """eval-bin CLI end-to-end with a synthetic .bin and a tiny ckpt."""
    import json as _json

    from crfr.cli import main
    from crfr.data.bins import save_bin
    from crfr.data.synthetic import SyntheticFaces

    ckpt, _ = cli_ckpt                       # session-shared ckpt
    capsys.readouterr()

    data = SyntheticFaces(num_classes=8, image_size=32, seed=3)
    rng = np.random.default_rng(0)
    i1, i2, issame = data.eval_pairs(rng, 16)
    p = str(tmp_path / "pairs.bin")
    save_bin(p, i1.astype(np.uint8), i2.astype(np.uint8), issame)
    rc = main(["eval-bin", "--ckpt", ckpt, "--bin", p,
               "eval.n_folds=4"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= res["accuracy"] <= 1.0 and "eer" in res


def test_bin_roundtrip_and_eval(tmp_path, rng):
    from crfr.data.bins import evaluate_bin, load_bin, save_bin

    from crfr.data.synthetic import SyntheticFaces

    n, s = 24, 32
    # smooth images: JPEG error stays small (random noise would be ~±46)
    data = SyntheticFaces(num_classes=n, image_size=s, seed=3)
    img1 = data.prototypes.astype(np.uint8)
    img2 = img1.copy()
    issame = np.arange(n) % 2 == 0
    img2[~issame] = np.roll(img1[~issame], 1, axis=0)   # different identity
    p = str(tmp_path / "test.bin")
    save_bin(p, img1, img2, issame)

    r1, r2, rs = load_bin(p, image_size=s)
    assert r1.shape == (n, s, s, 3)
    np.testing.assert_array_equal(rs, issame)
    # JPEG is lossy; same-pairs must still be close
    assert np.abs(r1[0].astype(int) - img1[0].astype(int)).mean() < 15

    # trivial extract: mean pooling as "embedding" — same-pairs identical
    def extract(x):
        v = jnp.reshape(x.astype(jnp.float32), (x.shape[0], -1))
        return v[:, :64]

    res = evaluate_bin(p, extract, batch_size=8, image_size=s, n_folds=4)
    assert res.accuracy_mean > 0.9      # raw-pixel match separates these
