"""Golden parity for the matmul-formulated bicubic vs the real PIL and cv2.

These pin the parity-critical resize semantics (SURVEY.md §7 hard part #1):
the matmul path must match PIL.Image.resize(BICUBIC) in 'pil' mode and
cv2.resize(INTER_CUBIC) in 'cv2' mode on random uint8 images, up/downscale.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from crfr.ops.bicubic import degrade_updown, resize_bicubic, resize_matrix


def _rand_img(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("in_size,out_size", [(112, 16), (112, 8), (16, 112),
                                              (112, 112), (100, 37), (24, 112)])
def test_pil_float_parity(rng, in_size, out_size):
    """Float path must match PIL's own float ('F'-mode) resampling tightly."""
    from PIL import Image

    img = rng.uniform(0, 255, size=(in_size, in_size)).astype(np.float32)
    ours = np.asarray(
        resize_bicubic(jnp.asarray(img), (out_size, out_size), "pil"))
    ref = np.asarray(
        Image.fromarray(img, mode="F").resize((out_size, out_size), Image.BICUBIC),
        dtype=np.float32)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


@pytest.mark.parametrize("in_size,out_size", [(112, 16), (112, 8), (16, 112),
                                              (112, 112), (24, 112)])
def test_pil_uint8_parity(rng, in_size, out_size):
    """u8_pipeline emulation must match PIL's 8bpc path (uint8 intermediate,
    horizontal-first) to within its fixed-point coefficient quantization."""
    from PIL import Image

    img = _rand_img(rng, in_size, in_size)
    ours = np.asarray(
        resize_bicubic(jnp.asarray(img, jnp.float32), (out_size, out_size),
                       "pil", u8_pipeline=True))
    ref = np.asarray(
        Image.fromarray(img).resize((out_size, out_size), Image.BICUBIC),
        dtype=np.float32)
    diff = np.abs(ours - ref)
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert np.mean(diff == 0) > 0.95


@pytest.mark.parametrize("in_size,out_size", [(112, 16), (16, 112), (112, 56),
                                              (56, 112)])
def test_cv2_parity(rng, in_size, out_size):
    import cv2

    img = _rand_img(rng, in_size, in_size)
    ours = np.asarray(
        resize_bicubic(jnp.asarray(img, jnp.float32), (out_size, out_size), "cv2"))
    ref = cv2.resize(img, (out_size, out_size),
                     interpolation=cv2.INTER_CUBIC).astype(np.float32)
    ours_u8 = np.clip(np.round(ours), 0, 255)
    diff = np.abs(ours_u8 - ref)
    assert np.mean(diff <= 1) > 0.99, f"mean leq1 {np.mean(diff <= 1)}"


def test_rows_sum_to_one():
    for mode in ("pil", "cv2"):
        for a, b in [(112, 16), (16, 112), (112, 112), (50, 20)]:
            w = resize_matrix(a, b, mode)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_degrade_matches_two_pass(rng):
    img = jnp.asarray(_rand_img(rng, 112, 112), jnp.float32)
    composed = degrade_updown(img, 16, "pil")
    two_pass = resize_bicubic(resize_bicubic(img, (16, 16), "pil"),
                              (112, 112), "pil")
    np.testing.assert_allclose(np.asarray(composed), np.asarray(two_pass),
                               atol=1e-2)


def test_degrade_pil_end_to_end(rng):
    """Degradation with uint8 intermediate must match PIL down→up exactly."""
    from PIL import Image

    raw = _rand_img(rng, 112, 112)
    ours = degrade_updown(jnp.asarray(raw, jnp.float32), 16, "pil",
                          round_intermediate=True)
    small = Image.fromarray(raw).resize((16, 16), Image.BICUBIC)
    ref = np.asarray(small.resize((112, 112), Image.BICUBIC), np.float32)
    diff = np.abs(np.clip(np.round(np.asarray(ours)), 0, 255) - ref)
    assert np.mean(diff <= 1) > 0.999


def test_batched_rank4(rng):
    imgs = np.stack([_rand_img(rng, 112, 112) for _ in range(4)])
    out = resize_bicubic(jnp.asarray(imgs, jnp.float32), (16, 16), "pil")
    assert out.shape == (4, 16, 16, 3)
    one = resize_bicubic(jnp.asarray(imgs[0], jnp.float32), (16, 16), "pil")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(one), atol=1e-3)
