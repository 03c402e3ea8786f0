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
from crfr.ops.bicubic import degrade_matrix, resize_matrix
from crfr.ops.normalize import normalize


def make_extract_fn(backbone_apply: Callable, degrade_to: int | None = None,
                    resize_mode: str = "pil", flip: bool = True,
                    flip_fusion: str = "sum", image_size: int = 112,
                    state_fn: Callable | None = None,
                    sr_apply: Callable | None = None,
                    mesh=None):
    """Build the jitted extract pipeline: raw pixels → embeddings.

    ``mesh``: shard each input batch over the mesh (data-parallel
    extraction). Without it a replicated-weights program on a >1-device
    mesh makes GSPMD run the FULL batch on EVERY device — redundant
    compute instead of an n_devices-way split. Batches whose leading dim
    does not divide the device count fall back to the unsharded program.

    ``backbone_apply``: normalized pixels → embeddings (pure, jittable).
    Without ``state_fn`` the weights it closes over are baked into the
    compiled program at first call — a SNAPSHOT; keep training and the
    extract fn silently embeds with stale weights. Pass
    ``state_fn() -> pytree`` (e.g. ``Trainer.embed_state``) and a
    state-threading ``backbone_apply(state, x)`` to always embed with the
    caller's LIVE weights while still compiling exactly once.

    ``sr_apply`` (normalized LR → normalized HR pixels, e.g.
    ``sr_loop.load_sr_apply``) routes the probe through the hallucinator:
    image → bicubic↓ to ``degrade_to`` → G ↑ → backbone, replacing the
    plain bicubic down→up degradation — the paper's hallucination-aided
    recognition protocol. Requires ``degrade_to`` (the G input size).
    """
    if sr_apply is not None:
        assert degrade_to is not None, "sr_apply needs degrade_to (LR size)"
        # one-way ↓ operator; the hallucinator provides the ↑ path
        w = jnp.asarray(resize_matrix(image_size, degrade_to, resize_mode))
    elif degrade_to is not None:
        w = jnp.asarray(degrade_matrix(image_size, degrade_to, resize_mode))
    else:
        w = None

    if state_fn is None:
        apply = lambda _s, x: backbone_apply(x)            # noqa: E731
        get_state = tuple
    else:
        apply = backbone_apply
        get_state = state_fn

    @jax.jit
    def f(state, images):
        x = images.astype(jnp.float32)
        if w is not None:
            # 'highest': eval-path degradation must match the golden-tested
            # f32 ops (TPU default precision would truncate to bf16).
            x = jnp.einsum("oi,bijc,pj->bopc", w, x, w,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        x = normalize(x)
        if sr_apply is not None:
            x = sr_apply(x)                 # hallucinate LR → HR on-device
        emb = apply(state, x)
        if flip:
            emb_f = apply(state, x[:, :, ::-1, :])
            if flip_fusion == "sum":
                emb = emb + emb_f
            else:
                emb = jnp.concatenate([emb, emb_f], axis=-1)
        return emb

    if mesh is not None and int(mesh.devices.size) > 1:
        from crfr.parallel.mesh import maybe_shard_batch

        return lambda images: f(get_state(),
                                maybe_shard_batch(mesh, jnp.asarray(images)))
    return lambda images: f(get_state(), images)


def extract_embeddings(paths: Sequence[str], extract_fn, batch_size: int = 256,
                       image_size: int = 112) -> np.ndarray:
    """Run extract_fn over image paths; returns (N, D) f32.

    Double-buffered: batch i+1 is dispatched (and decoded, via the
    threaded embed_batches) before batch i's result is forced back to the
    host, so device compute, host decode, and D2H copies all overlap."""
    # Don't pad a tiny set to the full serving batch — the zero rows are
    # real forward FLOPs. Multiple-of-8 keeps shape variants few.
    batch_size = min(batch_size, max(-(-len(paths) // 8) * 8, 8))
    outs = []
    pending = None                      # (device embeddings, n_valid)
    for imgs, n_valid in embed_batches(paths, batch_size, image_size):
        emb = extract_fn(jnp.asarray(imgs))     # async dispatch
        if pending is not None:
            outs.append(np.asarray(pending[0])[:pending[1]])
        pending = (emb, n_valid)
    if pending is not None:
        outs.append(np.asarray(pending[0])[:pending[1]])
    return np.concatenate(outs) if outs else np.zeros((0, 0), np.float32)
