"""FaceRecognizer one-call API: landmarks path, embed/match, verify."""

import numpy as np
import pytest

from crfr.configs import Config, DataCfg, LossCfg, MeshCfg, ModelCfg, TrainCfg
from crfr.ops.similarity import REFERENCE_LANDMARKS_112
from crfr.pipeline import FaceRecognizer


@pytest.fixture(scope="module")
def rec():
    cfg = Config(
        name="api-test", mesh=MeshCfg(data=1),
        data=DataCfg(image_size=112, num_classes=4),
        model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                       dropout=0.0),
        loss=LossCfg(), train=TrainCfg(batch_size=4))
    return FaceRecognizer.from_config(cfg)


def test_align_with_landmarks(rec, rng):
    img = rng.integers(0, 256, (200, 180, 3)).astype(np.uint8)
    lms = np.stack([REFERENCE_LANDMARKS_112 + 20,
                    REFERENCE_LANDMARKS_112 + 50]).astype(np.float32)
    crops = rec.detect_and_align(img, lms)
    assert crops.shape == (2, 112, 112, 3) and crops.dtype == np.uint8


def test_embed_and_similarity(rec, rng):
    crops = rng.integers(0, 256, (3, 112, 112, 3)).astype(np.uint8)
    embs = rec.embed(crops)
    assert embs.shape == (3, 512)
    sims = rec.similarity(embs, embs)
    np.testing.assert_allclose(np.diag(sims), 1.0, atol=1e-5)


def test_verify_with_landmarks(rec, rng):
    img = rng.integers(0, 256, (160, 160, 3)).astype(np.uint8)
    lm = (REFERENCE_LANDMARKS_112 + 20).astype(np.float32)[None]
    same, cos = rec.verify(img, img, lm, lm)
    assert same and cos == pytest.approx(1.0, abs=1e-4)


def test_empty_landmarks(rec, rng):
    img = rng.integers(0, 256, (160, 160, 3)).astype(np.uint8)
    crops = rec.detect_and_align(img, np.zeros((0, 5, 2), np.float32))
    assert crops.shape == (0, 112, 112, 3)
    assert rec.embed(crops).shape == (0, 512)
