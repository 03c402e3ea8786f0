"""Batched embedding extraction from image paths — the shared front half of
every eval protocol (SURVEY.md §3.3 "embed extraction" hot path).

Static-shape batching (remainder zero-padded), optional horizontal-flip TTA
with sum/concat fusion, optional fixed-size probe degradation — all inside
one jitted program per batch.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crfr.data.pipeline import embed_batches
from crfr.ops.bicubic import degrade_matrix
from crfr.ops.normalize import normalize


def make_extract_fn(backbone_apply: Callable, degrade_to: int | None = None,
                    resize_mode: str = "pil", flip: bool = True,
                    flip_fusion: str = "sum", image_size: int = 112):
    """backbone_apply: normalized pixels → embeddings (pure, jittable)."""
    if degrade_to is not None:
        w = jnp.asarray(degrade_matrix(image_size, degrade_to, resize_mode))
    else:
        w = None

    @jax.jit
    def f(images):
        x = images.astype(jnp.float32)
        if w is not None:
            # 'highest': eval-path degradation must match the golden-tested
            # f32 ops (TPU default precision would truncate to bf16).
            x = jnp.einsum("oi,bijc,pj->bopc", w, x, w,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        x = normalize(x)
        emb = backbone_apply(x)
        if flip:
            emb_f = backbone_apply(x[:, :, ::-1, :])
            if flip_fusion == "sum":
                emb = emb + emb_f
            else:
                emb = jnp.concatenate([emb, emb_f], axis=-1)
        return emb

    return f


def extract_embeddings(paths: Sequence[str], extract_fn, batch_size: int = 256,
                       image_size: int = 112) -> np.ndarray:
    """Run extract_fn over image paths; returns (N, D) f32."""
    outs = []
    for imgs, n_valid in embed_batches(paths, batch_size, image_size):
        emb = np.asarray(extract_fn(jnp.asarray(imgs)))
        outs.append(emb[:n_valid])
    return np.concatenate(outs) if outs else np.zeros((0, 0), np.float32)
