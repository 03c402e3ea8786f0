"""Residual branch for teacher–student knowledge distillation (SURVEY.md
§2.1 "Student + residual knowledge distillation", §3.5).

The branch models the teacher−student embedding gap: r = R(s_feat), trained
so that s + r ≈ t. At inference the student runs alone (or with the branch —
both supported); the branch keeps the student's own embedding space anchored
to the classifier while absorbing the cross-resolution mismatch.

Implemented as a 2-layer bottleneck MLP on the student embedding — the
residual signal is low-rank in practice and a conv tower here would add
nothing but compile time on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from crfr.models.irse import PReLU


class ResidualBranch(nnx.Module):
    def __init__(self, dim: int = 512, hidden: int = 512, *, rngs: nnx.Rngs,
                 dtype=jnp.float32):
        self.fc1 = nnx.Linear(dim, hidden, dtype=dtype, rngs=rngs)
        self.prelu = PReLU(hidden)
        self.fc2 = nnx.Linear(hidden, dim, dtype=dtype, rngs=rngs)
        self.bn = nnx.BatchNorm(dim, momentum=0.9, dtype=jnp.float32,
                                rngs=rngs)

    def __call__(self, emb: jax.Array, *, train: bool = False) -> jax.Array:
        r = self.fc2(self.prelu(self.fc1(emb)))
        return self.bn(r.astype(jnp.float32), use_running_average=not train)
