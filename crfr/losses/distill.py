"""Residual knowledge distillation — the paper's titular contribution.

SURVEY.md §2.1 "Student + residual knowledge distillation" / §3.5: the frozen
HR teacher produces a target embedding t; the LR student produces s plus a
residual branch r learned from an intermediate feature; training pushes
(s + r) toward t while the classification CE is taken on the student
embedding. The combined objective is

    L = CE(ArcFace(s, y)) + λ · ‖(s + r) − t‖²

(feature-space L2; the paper's residual branch models the teacher−student
gap so the student alone stays cheap at inference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_l2(a: jax.Array, b: jax.Array, normalize: bool = False) -> jax.Array:
    """Mean squared L2 distance between embedding batches (B, D)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if normalize:
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
    return jnp.mean(jnp.sum(jnp.square(a - b), axis=-1))


def residual_kd_loss(student_emb: jax.Array, residual_emb: jax.Array,
                     teacher_emb: jax.Array, weight: float = 1.0,
                     normalize: bool = False) -> jax.Array:
    """λ · ‖(s + r) − stop_grad(t)‖² — teacher is frozen (no grad)."""
    t = jax.lax.stop_gradient(teacher_emb)
    return weight * feature_l2(student_emb + residual_emb, t,
                               normalize=normalize)
