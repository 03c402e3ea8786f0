"""MTCNN cascade machinery: net shapes, NMS/decode oracles, full cascade
plumbing with synthetic inputs (no pretrained weights exist in-sandbox)."""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from crfr.models.mtcnn import (MTCNN, ONet, PNet, RNet, apply_regression,
                               decode_pnet, nms, square_boxes)


def test_net_output_shapes():
    p = PNet(rngs=nnx.Rngs(0))
    prob, reg = p(jnp.zeros((1, 12, 12, 3)))
    assert prob.shape == (1, 1, 1) and reg.shape == (1, 1, 1, 4)
    prob, reg = p(jnp.zeros((1, 100, 80, 3)))
    assert prob.shape == (1, 45, 35) and reg.shape == (1, 45, 35, 4)

    r = RNet(rngs=nnx.Rngs(0))
    pr, rg = r(jnp.zeros((2, 24, 24, 3)))
    assert pr.shape == (2,) and rg.shape == (2, 4)

    o = ONet(rngs=nnx.Rngs(0))
    pr, rg, lm = o(jnp.zeros((2, 48, 48, 3)))
    assert pr.shape == (2,) and rg.shape == (2, 4) and lm.shape == (2, 10)


def test_nms_oracle():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]            # near-duplicate suppressed
    keep = nms(boxes, scores, 0.95)
    assert keep.tolist() == [0, 1, 2]         # lenient keeps all


def test_decode_pnet_coords():
    prob = np.zeros((5, 5), np.float32)
    prob[2, 3] = 0.9
    reg = np.zeros((5, 5, 4), np.float32)
    b = decode_pnet(prob, reg, scale=1.0, thresh=0.5)
    assert b.shape == (1, 9)
    x1, y1, x2, y2, s = b[0, :5]
    assert (x1, y1) == (6, 4) and (x2, y2) == (18, 16)   # stride 2, cell 12
    assert s == pytest.approx(0.9)


def test_regression_and_square():
    b = np.array([[0, 0, 10, 20, 0.9, 0.1, 0.1, -0.1, -0.1]], np.float32)
    out = apply_regression(b)
    np.testing.assert_allclose(out[0, :4], [1, 2, 9, 18])
    sq = square_boxes(out)
    w = sq[0, 2] - sq[0, 0]
    h = sq[0, 3] - sq[0, 1]
    assert w == pytest.approx(h)


def test_cascade_runs_end_to_end(rng):
    """Random weights won't find faces, but the cascade must run cleanly on
    a real image and return a well-formed (possibly empty) Detection; with
    thresholds at 0 it must produce boxes + landmarks plumbing-correctly."""
    det = MTCNN(min_face=40, thresholds=(0.3, 0.0, 0.0))
    img = rng.integers(0, 256, (160, 120, 3)).astype(np.uint8)
    out = det.detect(img)
    assert out.boxes.ndim == 2 and out.boxes.shape[1] == 4
    assert out.landmarks.shape[1:] == (5, 2) or len(out.landmarks) == 0
    assert len(out.scores) == len(out.boxes) == len(out.landmarks)


def test_weight_import_by_order():
    import torch

    p = PNet(rngs=nnx.Rngs(0))
    sd = {
        "conv1.weight": torch.randn(10, 3, 3, 3),
        "conv1.bias": torch.randn(10),
        "prelu1.weight": torch.randn(10),
        "conv2.weight": torch.randn(16, 10, 3, 3),
        "conv2.bias": torch.randn(16),
        "prelu2.weight": torch.randn(16),
        "conv3.weight": torch.randn(32, 16, 3, 3),
        "conv3.bias": torch.randn(32),
        "prelu3.weight": torch.randn(32),
        "cls.weight": torch.randn(2, 32, 1, 1),
        "cls.bias": torch.randn(2),
        "reg.weight": torch.randn(4, 32, 1, 1),
        "reg.bias": torch.randn(4),
    }
    det = MTCNN()
    det.pnet = p
    det.load_torch_weights(pnet_sd=sd)
    np.testing.assert_allclose(
        np.asarray(p.conv1.kernel.value),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(np.asarray(p.prelu2.alpha.value),
                               sd["prelu2.weight"].numpy())
