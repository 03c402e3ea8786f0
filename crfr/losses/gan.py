"""SR / hallucination losses (SURVEY.md §3.2): pixel + adversarial +
identity (teacher features) + prior consistency.

Adversarial objective is LSGAN (least-squares — stabler than BCE for SR and
free of logits-saturation; a ``bce`` mode is provided for parity runs).
Identity loss pulls teacher embeddings of the SR image toward those of the
HR target — the cross-resolution ingredient that keeps hallucinated faces
recognizable (paper's L_id).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def pixel_loss(sr: jax.Array, hr: jax.Array, kind: str = "l2") -> jax.Array:
    d = (sr.astype(jnp.float32) - hr.astype(jnp.float32))
    if kind == "l1":
        return jnp.mean(jnp.abs(d))
    return jnp.mean(jnp.square(d))


def adversarial_g_loss(fake_logits: jax.Array, mode: str = "lsgan") -> jax.Array:
    f = fake_logits.astype(jnp.float32)
    if mode == "lsgan":
        return jnp.mean(jnp.square(f - 1.0))
    return jnp.mean(optax.sigmoid_binary_cross_entropy(f, jnp.ones_like(f)))


def adversarial_d_loss(real_logits: jax.Array, fake_logits: jax.Array,
                       mode: str = "lsgan") -> jax.Array:
    r = real_logits.astype(jnp.float32)
    f = fake_logits.astype(jnp.float32)
    if mode == "lsgan":
        return 0.5 * (jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f)))
    return 0.5 * (
        jnp.mean(optax.sigmoid_binary_cross_entropy(r, jnp.ones_like(r)))
        + jnp.mean(optax.sigmoid_binary_cross_entropy(f, jnp.zeros_like(f))))


def identity_loss(emb_sr: jax.Array, emb_hr: jax.Array) -> jax.Array:
    """‖T(sr) − stop_grad(T(hr))‖² on L2-normalized teacher embeddings."""
    a = emb_sr.astype(jnp.float32)
    b = jax.lax.stop_gradient(emb_hr.astype(jnp.float32))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
    return jnp.mean(jnp.sum(jnp.square(a - b), axis=-1))


def perceptual_loss(feats_sr: list, feats_hr: list) -> jax.Array:
    """Recognition-feature perceptual loss: mean L1 gap between the
    backbone's stage-boundary feature maps of SR and HR (finest→coarsest,
    equally weighted, each level normalized by its own HR magnitude so no
    scale dominates). The TPU-native, download-free stand-in for VGG/LPIPS
    features — the taps come from ``IRBackbone.features`` of the frozen
    teacher, so the whole term stays inside the one jitted G-step."""
    total = 0.0
    for a, b in zip(feats_sr, feats_hr):
        a = a.astype(jnp.float32)
        b = jax.lax.stop_gradient(b.astype(jnp.float32))
        scale = jnp.mean(jnp.abs(b)) + 1e-6
        total = total + jnp.mean(jnp.abs(a - b)) / scale
    return total / max(len(feats_sr), 1)


def prior_loss(pred_priors: jax.Array, target_priors: jax.Array) -> jax.Array:
    """MSE between predicted priors and targets (landmark heatmaps / parsing
    maps from an external annotator, or a frozen prior net run on HR)."""
    return jnp.mean(jnp.square(pred_priors.astype(jnp.float32)
                               - jax.lax.stop_gradient(
                                   target_priors.astype(jnp.float32))))
