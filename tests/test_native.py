"""Native C++ preprocessing vs PIL/cv2 goldens and the JAX ops path."""

import numpy as np
import pytest

import jax.numpy as jnp

from crfr import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_resize_u8_matches_pil(rng):
    from PIL import Image

    img = rng.integers(0, 256, (112, 112, 3)).astype(np.uint8)
    for out in (16, 56, 224):
        ours = native.resize_bicubic(img, (out, out), "pil")
        ref = np.asarray(Image.fromarray(img).resize((out, out),
                                                     Image.BICUBIC))
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (out, diff.max())
        assert np.mean(diff == 0) > 0.95


def test_resize_f32_matches_jax_ops(rng):
    from crfr.ops.bicubic import resize_bicubic as jax_resize

    img = rng.uniform(0, 255, (64, 80, 3)).astype(np.float32)
    for mode in ("pil", "cv2"):
        ours = native.resize_bicubic(img, (112, 112), mode)
        want = np.asarray(jax_resize(jnp.asarray(img), (112, 112), mode))
        np.testing.assert_allclose(ours, want, atol=1e-2)


def test_solve_similarity_matches_jax(rng):
    from crfr.ops.similarity import REFERENCE_LANDMARKS_112, similarity_transform

    lm = (REFERENCE_LANDMARKS_112 + rng.normal(0, 3, (5, 2))).astype(np.float32)
    ours = native.solve_similarity(lm, REFERENCE_LANDMARKS_112)
    want = np.asarray(similarity_transform(jnp.asarray(lm),
                                           jnp.asarray(REFERENCE_LANDMARKS_112)))
    np.testing.assert_allclose(ours, want, atol=1e-3)


def test_warp_matches_jax(rng):
    from crfr.ops.similarity import REFERENCE_LANDMARKS_112, align_matrix
    from crfr.ops.warp import warp_affine as jax_warp

    img = rng.integers(0, 256, (160, 140, 3)).astype(np.float32)
    lm = (REFERENCE_LANDMARKS_112 + rng.normal(0, 2, (5, 2)) + 20).astype(np.float32)
    m = np.asarray(align_matrix(jnp.asarray(lm)))
    ours = native.warp_affine(img, m, (112, 112))
    want = np.asarray(jax_warp(jnp.asarray(img), jnp.asarray(m)))
    np.testing.assert_allclose(ours, want, atol=1e-2)


def test_align_crop_end_to_end(rng):
    img = rng.integers(0, 256, (160, 160, 3)).astype(np.uint8)
    from crfr.ops.similarity import REFERENCE_LANDMARKS_112

    lm = (REFERENCE_LANDMARKS_112 + 20).astype(np.float32)
    out = native.align_crop(img, lm)
    assert out.shape == (112, 112, 3) and out.dtype == np.uint8
    # sanity: output is a shifted crop, so its interior matches the source
    # region (landmarks offset by +20 → pure translation)
    np.testing.assert_allclose(
        out[30:80, 30:80].astype(int),
        img[50:100, 50:100].astype(int), atol=1)


def test_normalize(rng):
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    out = native.normalize(img)
    np.testing.assert_allclose(out, (img.astype(np.float32) - 127.5) / 128.0,
                               atol=1e-6)
