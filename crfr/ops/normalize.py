"""Pixel normalization: (x − 127.5) / 128 — the insightface/face.evoLVe
convention named by the BASELINE contract ("mean/std normalization"), mapping
uint8 RGB into ≈[−1, 1].

Kept as its own tiny op so the XLA path, the Pallas fused-preprocessing path
(crfr/ops/fused_pallas.py) and the torch parity twin all pin the identical
constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MEAN = 127.5
STD = 128.0


def normalize(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    return ((x.astype(jnp.float32) - MEAN) * (1.0 / STD)).astype(dtype)


def denormalize(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32) * STD + MEAN
