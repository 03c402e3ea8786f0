"""Detection end-to-end WITHOUT downloaded weights (VERDICT r2 next #5):
train the MTCNN cascade on procedurally rendered faces, then detect a face
the system has never seen, check box IoU + landmark error, and confirm the
detect→align→embed pipeline agrees with ground-truth-landmark alignment."""

import numpy as np
import pytest

import jax.numpy as jnp

from crfr.models.mtcnn import MTCNN
from crfr.train.mtcnn_train import (Scene, iou, render_scene, sample_crops,
                                    train_mtcnn_synthetic)


def test_renderer_geometry(rng):
    sc = render_scene(rng, 160)
    assert sc.image.shape == (160, 160, 3)
    x1, y1, x2, y2 = sc.box
    assert 0 <= x1 < x2 <= 160 and 0 <= y1 < y2 <= 160
    # all landmarks inside the box
    assert (sc.landmarks[:, 0] >= x1).all() and (sc.landmarks[:, 0] <= x2).all()
    assert (sc.landmarks[:, 1] >= y1).all() and (sc.landmarks[:, 1] <= y2).all()
    # eyes above mouth (image y grows downward)
    assert sc.landmarks[:2, 1].max() < sc.landmarks[3:, 1].min()


def test_sample_crops_targets(rng):
    sc = render_scene(rng, 160)
    crops, cls, reg, lmk = sample_crops(rng, sc, 24, n_pos=4, n_neg=4)
    assert crops.shape == (8, 24, 24, 3)
    assert cls.sum() == 4
    # applying the regression target to a positive crop recovers the GT box
    i = int(np.argmax(cls))
    # reconstruct the crop box from reg: reg = (g - b) / side
    # → a synthetic check: positives' reg targets are small, negatives zero
    assert np.abs(reg[cls == 1]).max() < 0.5
    assert np.abs(reg[cls == 0]).max() == 0
    # positive landmarks are inside the crop (0..1 box-relative)
    assert (lmk[cls == 1] > -0.2).all() and (lmk[cls == 1] < 1.2).all()


@pytest.mark.slow
def test_trained_cascade_detects_and_aligns(rng):
    mt = MTCNN(min_face=40, thresholds=(0.6, 0.6, 0.6), seed=0)
    losses = train_mtcnn_synthetic(mt, steps=150, batch_scenes=6, seed=0)
    assert all(np.isfinite(v) for v in losses.values()), losses

    # fresh scenes, never seen in training
    hits = 0
    lmk_errs = []
    test_rng = np.random.default_rng(10**6)
    scenes = [render_scene(test_rng, 160) for _ in range(6)]
    for sc in scenes:
        det = mt.detect(sc.image)
        if len(det.boxes) == 0:
            continue
        best = int(np.argmax(det.scores))
        if iou(det.boxes[best], sc.box) >= 0.5:
            hits += 1
            side = sc.box[2] - sc.box[0]
            lmk_errs.append(
                np.abs(det.landmarks[best] - sc.landmarks).mean() / side)
    assert hits >= 4, f"detected {hits}/6 rendered faces"
    assert np.mean(lmk_errs) < 0.12, lmk_errs

    # detect→align→embed consistency vs GT-landmark alignment — the full
    # FaceRecognizer pipeline with NO landmarks passed (cascade does it all)
    from crfr.configs import Config, ModelCfg
    from crfr.pipeline import FaceRecognizer

    cfg = Config(model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                                dropout=0.0))
    rec = FaceRecognizer.from_config(cfg, detector=mt)
    # pick a scene the cascade detected well
    sc = next(s for s in scenes
              if len(mt.detect(s.image).boxes)
              and iou(mt.detect(s.image).boxes[
                  int(np.argmax(mt.detect(s.image).scores))], s.box) >= 0.5)
    crops_det = rec.detect_and_align(sc.image)          # cascade end-to-end
    assert len(crops_det) >= 1
    crops_gt = rec.detect_and_align(sc.image, sc.landmarks[None])
    e_det = rec.embed(crops_det[:1])
    e_gt = rec.embed(crops_gt)
    cos = float(rec.similarity(e_det, e_gt)[0, 0])
    assert cos > 0.8, f"detected-landmark alignment embeds inconsistently: {cos}"
