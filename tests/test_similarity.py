"""Similarity-transform solver vs an independent NumPy implementation and
skimage-style Umeyama; warp vs cv2.warpAffine."""

import numpy as np
import pytest

import jax.numpy as jnp
from crfr.ops.similarity import (
    REFERENCE_LANDMARKS_112,
    align_matrix,
    invert_affine,
    similarity_transform,
    umeyama_transform,
)
from crfr.ops.warp import warp_affine


def _numpy_nonreflective(src, dst):
    """Independent cp2tform-style LSQ in NumPy float64 (test oracle)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    n = len(x)
    A = np.zeros((2 * n, 4))
    A[:n] = np.stack([x, -y, np.ones(n), np.zeros(n)], axis=1)
    A[n:] = np.stack([y, x, np.zeros(n), np.ones(n)], axis=1)
    b = np.concatenate([u, v])
    p, *_ = np.linalg.lstsq(A, b, rcond=None)
    a_, b_, tx, ty = p
    return np.array([[a_, -b_, tx], [b_, a_, ty]])


def _rand_landmarks(rng, jitter=3.0):
    base = REFERENCE_LANDMARKS_112.copy()
    theta = rng.uniform(-0.4, 0.4)
    s = rng.uniform(0.7, 1.6)
    rot = s * np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
    t = rng.uniform(-30, 30, size=2)
    pts = base @ rot.T + t + rng.normal(0, jitter, size=base.shape)
    return pts.astype(np.float32)


@pytest.mark.parametrize("trial", range(5))
def test_matches_numpy_oracle(rng, trial):
    src = _rand_landmarks(rng)
    dst = REFERENCE_LANDMARKS_112
    ours = np.asarray(similarity_transform(jnp.asarray(src), jnp.asarray(dst)))
    ref = _numpy_nonreflective(src.astype(np.float64), dst.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_umeyama_equals_lsq(rng):
    """2-D non-reflective LSQ optimum == Umeyama (same objective, same family)."""
    for _ in range(5):
        src = _rand_landmarks(rng)
        m1 = np.asarray(similarity_transform(jnp.asarray(src),
                                             jnp.asarray(REFERENCE_LANDMARKS_112)))
        m2 = np.asarray(umeyama_transform(jnp.asarray(src),
                                          jnp.asarray(REFERENCE_LANDMARKS_112)))
        # f32 SVD in the Umeyama path costs ~1e-3 relative; the two
        # formulations are mathematically identical (see solver docstring).
        np.testing.assert_allclose(m1, m2, rtol=3e-3, atol=0.08)


def test_exact_recovery():
    """Noise-free similarity must be recovered exactly."""
    theta, s, tx, ty = 0.3, 1.2, 5.0, -7.0
    rot = s * np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
    src = REFERENCE_LANDMARKS_112
    dst = src @ rot.T + np.array([tx, ty])
    m = np.asarray(similarity_transform(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(m[:, :2], rot, atol=1e-4)
    np.testing.assert_allclose(m[:, 2], [tx, ty], atol=1e-3)


def test_invert_roundtrip(rng):
    src = _rand_landmarks(rng)
    m = similarity_transform(jnp.asarray(src), jnp.asarray(REFERENCE_LANDMARKS_112))
    minv = invert_affine(m)
    pts = jnp.asarray(rng.uniform(0, 112, size=(7, 2)), jnp.float32)
    fwd = pts @ m[:, :2].T + m[:, 2]
    back = fwd @ minv[:, :2].T + minv[:, 2]
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_warp_matches_cv2(rng):
    import cv2

    img = rng.integers(0, 256, size=(160, 140, 3)).astype(np.uint8)
    lmk = _rand_landmarks(rng, jitter=1.0) + np.array([20, 20], np.float32)
    m = np.asarray(align_matrix(jnp.asarray(lmk)))
    ours = np.asarray(warp_affine(jnp.asarray(img, jnp.float32), jnp.asarray(m)))
    ref = cv2.warpAffine(img.astype(np.float32), m, (112, 112),
                         flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # interior pixels should agree tightly; borders may differ by sampling edge
    diff = np.abs(ours - ref)[2:-2, 2:-2]
    assert np.percentile(diff, 99) < 1.0, np.percentile(diff, 99)
    assert diff.mean() < 0.3


def test_reflection_guard(rng):
    """With a mirrored source, allow_reflection picks the mirrored solution."""
    src = REFERENCE_LANDMARKS_112 * np.array([-1.0, 1.0], np.float32)
    m = similarity_transform(jnp.asarray(src),
                             jnp.asarray(REFERENCE_LANDMARKS_112),
                             allow_reflection=True)
    res = np.asarray(src @ np.asarray(m)[:, :2].T + np.asarray(m)[:, 2])
    np.testing.assert_allclose(res, REFERENCE_LANDMARKS_112, atol=1e-2)
