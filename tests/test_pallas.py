"""Pallas fused preprocessing vs the XLA ops path (interpreter mode on CPU;
the on-device check runs under CRFR_TEST_TPU=1)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from crfr.ops.bicubic import degrade_updown, resize_bicubic
from crfr.ops.fused_pallas import fused_degrade_normalize, fused_resize_normalize
from crfr.ops.normalize import normalize

_INTERPRET = not os.environ.get("CRFR_TEST_TPU")


def test_fused_degrade_matches_ops_path(rng):
    x = rng.integers(0, 256, (3, 112, 112, 3)).astype(np.float32)
    got = fused_degrade_normalize(jnp.asarray(x), 16, "pil",
                                  out_dtype=jnp.float32,
                                  interpret=_INTERPRET)
    want = normalize(degrade_updown(jnp.asarray(x), 16, "pil"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)


def test_fused_degrade_bf16_cast(rng):
    x = rng.integers(0, 256, (2, 112, 112, 3)).astype(np.float32)
    got = fused_degrade_normalize(jnp.asarray(x), 16, "pil",
                                  out_dtype=jnp.bfloat16,
                                  interpret=_INTERPRET)
    assert got.dtype == jnp.bfloat16
    want = normalize(degrade_updown(jnp.asarray(x), 16, "pil"))
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=2e-2, rtol=2e-2)


def test_fused_resize_matches_ops_path(rng):
    x = rng.integers(0, 256, (2, 160, 140, 3)).astype(np.float32)
    got = fused_resize_normalize(jnp.asarray(x), (112, 112), "pil",
                                 out_dtype=jnp.float32,
                                 interpret=_INTERPRET)
    want = normalize(resize_bicubic(jnp.asarray(x), (112, 112), "pil"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)
