"""FULL-PIPELINE accuracy cross-check vs an independent torch/PIL/NumPy
reference (VERDICT round-1 "Next #2"; SURVEY.md §4 item 1, §6 action).

Same weights, complete eval path, two independent stacks:

  crfr:      make_extract_fn (matmul PIL-bicubic 112→16→112 degrade +
             normalize + IR-18 + flip-TTA sum) → evaluate_verification
             (one jitted 10-fold program)
  reference: PIL.Image F-mode bicubic per channel + (x−127.5)/128 +
             the torch twin (test_irse_parity) + torch flip + a NumPy
             re-implementation of the fold protocol written from the
             protocol SPEC (not from crfr's code)

Asserted: (a) embeddings agree to float tolerance end-to-end, (b) the two
protocol implementations produce IDENTICAL accuracy/thresholds on shared
distances, (c) end-to-end accuracy agrees. This is the drift net the
per-op goldens can't provide — any protocol convention or numerics change
on either half trips it.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from flax import nnx

from crfr.eval.extract import make_extract_fn
from crfr.eval.verification import evaluate_verification
from crfr.models.irse import IRBackbone
from tests.test_irse_parity import (TorchIR, _copy_bn, _copy_conv,
                                    _copy_linear, _copy_prelu)

N_PAIRS = 48
N_FOLDS = 6
DEGRADE = 16
SIZE = 112


def _build_twins():
    jm = IRBackbone(depth="18", dtype=jnp.float32, rngs=nnx.Rngs(11))
    rng = np.random.default_rng(5)
    for _, m in nnx.iter_graph(jm):
        if isinstance(m, nnx.BatchNorm):
            n = m.mean.value.shape[0]
            m.mean.value = jnp.asarray(rng.normal(0, 0.5, n), jnp.float32)
            m.var.value = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
            m.scale.value = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
            m.bias.value = jnp.asarray(rng.normal(0, 0.2, n), jnp.float32)
    tm = TorchIR([(64, 2), (128, 2), (256, 2), (512, 2)])
    _copy_conv(tm.inp[0], jm.input_conv)
    _copy_bn(tm.inp[1], jm.input_bn)
    _copy_prelu(tm.inp[2], jm.input_prelu)
    for tb, jb in zip(tm.blocks, jm.blocks):
        _copy_bn(tb.bn0, jb.bn0)
        _copy_conv(tb.conv1, jb.conv1)
        _copy_prelu(tb.prelu, jb.prelu)
        _copy_conv(tb.conv2, jb.conv2)
        _copy_bn(tb.bn2, jb.bn2)
        if tb.short is not None:
            _copy_conv(tb.short[0], jb.shortcut_conv)
            _copy_bn(tb.short[1], jb.shortcut_bn)
    _copy_bn(tm.out_bn, jm.out_bn)
    _copy_linear(tm.out_fc, jm.out_linear)
    _copy_bn(tm.out_feat_bn, jm.out_feat_bn)
    tm.eval()
    return jm, tm


# ---------------- independent reference pipeline (PIL + torch + NumPy) ------


def _pil_degrade(imgs: np.ndarray, low: int) -> np.ndarray:
    """PIL F-mode bicubic down→up per channel (float, no uint8 rounding)."""
    from PIL import Image

    out = np.empty_like(imgs, dtype=np.float32)
    for i in range(imgs.shape[0]):
        for c in range(3):
            ch = Image.fromarray(imgs[i, :, :, c].astype(np.float32),
                                 mode="F")
            ch = ch.resize((low, low), Image.BICUBIC)
            ch = ch.resize((SIZE, SIZE), Image.BICUBIC)
            out[i, :, :, c] = np.asarray(ch, np.float32)
    return out


def _torch_embed(tm, imgs: np.ndarray) -> np.ndarray:
    """normalize + forward + horizontal-flip TTA (sum fusion)."""
    x = (imgs.astype(np.float32) - 127.5) / 128.0
    x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        e = tm(x) + tm(torch.flip(x, dims=(3,)))
    return e.numpy()


def _ref_protocol(dist: np.ndarray, issame: np.ndarray, n_folds: int):
    """The fold protocol from its spec: thresholds linspace(0, 4, 400),
    contiguous KFold(shuffle=False) splits, per-fold best train-accuracy
    threshold, accuracy on the held-out fold. Plain loops."""
    n = len(dist)
    thresholds = np.linspace(0.0, 4.0, 400)
    sizes = np.full(n_folds, n // n_folds)
    sizes[: n % n_folds] += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    accs, thrs = [], []
    for f in range(n_folds):
        test = np.zeros(n, bool)
        test[bounds[f]:bounds[f + 1]] = True
        train = ~test
        best_acc, best_t = -1.0, thresholds[0]
        for t in thresholds:
            acc = np.mean((dist[train] < t) == issame[train])
            if acc > best_acc:
                best_acc, best_t = acc, t
        accs.append(np.mean((dist[test] < best_t) == issame[test]))
        thrs.append(best_t)
    return np.asarray(accs), np.asarray(thrs)


@pytest.mark.slow
def test_full_pipeline_accuracy_parity():
    from crfr.data.synthetic import SyntheticFaces

    jm, tm = _build_twins()
    data = SyntheticFaces(num_classes=6, image_size=SIZE, seed=3)
    i1, i2, issame = data.eval_pairs(np.random.default_rng(17), N_PAIRS)
    i1 = np.clip(np.round(i1), 0, 255).astype(np.uint8)
    i2 = np.clip(np.round(i2), 0, 255).astype(np.uint8)

    # ---- crfr path -------------------------------------------------------
    apply = lambda x: jm(x, train=False)                 # noqa: E731
    fn_hr = make_extract_fn(apply, degrade_to=None, resize_mode="pil",
                            flip=True, flip_fusion="sum", image_size=SIZE)
    fn_lr = make_extract_fn(apply, degrade_to=DEGRADE, resize_mode="pil",
                            flip=True, flip_fusion="sum", image_size=SIZE)
    e1_j = np.asarray(fn_hr(jnp.asarray(i1, jnp.float32)))
    e2_j = np.asarray(fn_lr(jnp.asarray(i2, jnp.float32)))

    # ---- reference path --------------------------------------------------
    e1_t = _torch_embed(tm, i1.astype(np.float32))
    e2_t = _torch_embed(tm, _pil_degrade(i2, DEGRADE))

    # (a) embeddings agree end-to-end (degrade + normalize + CNN + TTA)
    scale = np.abs(e1_t).mean()
    assert np.abs(e1_j - e1_t).max() < 2e-2 * max(scale, 1.0), (
        np.abs(e1_j - e1_t).max(), scale)
    assert np.abs(e2_j - e2_t).max() < 2e-2 * max(scale, 1.0)

    # (b) protocol implementations agree EXACTLY on shared distances
    def nrm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)

    dist_j = 2.0 - 2.0 * np.sum(nrm(e1_j) * nrm(e2_j), -1)
    res_j = evaluate_verification(e1_j, e2_j, issame, n_folds=N_FOLDS)
    ref_acc_on_j, ref_thr_on_j = _ref_protocol(dist_j.astype(np.float32),
                                               issame, N_FOLDS)
    np.testing.assert_allclose(res_j.fold_accuracies, ref_acc_on_j, atol=1e-6)
    np.testing.assert_allclose(res_j.best_thresholds, ref_thr_on_j, atol=1e-6)

    # (c) end-to-end: the reference stack's accuracy matches crfr's
    dist_t = 2.0 - 2.0 * np.sum(nrm(e1_t) * nrm(e2_t), -1)
    ref_acc, _ = _ref_protocol(dist_t, issame, N_FOLDS)
    assert abs(ref_acc.mean() - res_j.accuracy_mean) < 1e-6 + 2.0 / N_PAIRS, (
        ref_acc.mean(), res_j.accuracy_mean)
    # and both stacks separate the synthetic identities
    assert res_j.accuracy_mean > 0.7
