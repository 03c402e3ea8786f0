"""Serving export — ahead-of-time compiled, serialized embed artifacts.

Production-deployment path the reference never had: the full embed pipeline
(optional degrade + normalize + backbone, flip-TTA optional) is staged with
``jax.export`` into a portable StableHLO artifact that a serving binary can
deserialize and call with zero Python model code — weights are baked into
the artifact, shapes are static, and the compile happens once at export
time, not at pod-rollout time.

    export_embed(trainer, "/models/ir50.crfrx", batch=256)
    fn = load_embed("/models/ir50.crfrx")
    emb = fn(raw_uint8_batch)          # (256, 512) f32
"""

from __future__ import annotations

import json
import os
import struct
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_MAGIC = b"CRFRX001"


def build_serving_fn(backbone_apply: Callable, degrade_to: int | None = None,
                     resize_mode: str = "pil", flip_tta: bool = False,
                     image_size: int = 112,
                     sr_apply: Callable | None = None) -> Callable:
    """Raw (B, S, S, 3) pixels (uint8/f32) → (B, D) f32 embeddings.

    With ``sr_apply`` (frozen hallucinator, sr_loop.load_sr_apply) the
    pipeline becomes ↓``degrade_to`` → G ↑ → backbone — the full
    hallucination-aided serving path in one AOT artifact."""
    from crfr.ops.bicubic import degrade_matrix, resize_matrix
    from crfr.ops.normalize import normalize

    if sr_apply is not None:
        assert degrade_to is not None, "sr_apply needs degrade_to (LR size)"
        w = jnp.asarray(resize_matrix(image_size, degrade_to, resize_mode))
    elif degrade_to is not None:
        w = jnp.asarray(degrade_matrix(image_size, degrade_to, resize_mode))
    else:
        w = None

    def f(images):
        x = images.astype(jnp.float32)
        if w is not None:
            x = jnp.einsum("oi,bijc,pj->bopc", w, x, w,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        x = normalize(x)
        if sr_apply is not None:
            x = sr_apply(x)
        emb = backbone_apply(x)
        if flip_tta:
            emb = emb + backbone_apply(x[:, :, ::-1, :])
        return emb.astype(jnp.float32)

    return f


def export_embed(trainer, path: str, batch: int = 256,
                 degrade_to: int | None = None, flip_tta: bool = False,
                 input_dtype=jnp.uint8, sr_apply: Callable | None = None,
                 backbone_apply: Callable | None = None,
                 quantized: bool = False) -> dict:
    """Export a Trainer's backbone (optionally behind a frozen hallucinator)
    as a serialized serving artifact.

    ``backbone_apply`` overrides the float backbone — the int8 PTQ path
    (models/quant.py, 1.6× measured on-chip) exports through here; pass
    ``quantized=True`` so the artifact metadata records it."""
    cfg = trainer.cfg
    size = cfg.model.input_size
    model = trainer.model

    if backbone_apply is None:
        backbone_apply = lambda x: model.backbone(x, train=False)  # noqa: E731
    fn = build_serving_fn(backbone_apply,
                          degrade_to=degrade_to,
                          resize_mode=cfg.data.resize_mode,
                          flip_tta=flip_tta, image_size=size,
                          sr_apply=sr_apply)
    spec = jax.ShapeDtypeStruct((batch, size, size, 3), input_dtype)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    meta = {
        "batch": batch, "image_size": size,
        "embedding_dim": cfg.model.embedding_dim,
        "degrade_to": degrade_to, "flip_tta": flip_tta,
        "hallucinated": sr_apply is not None,
        "int8": quantized,
        "input_dtype": str(np.dtype(input_dtype)),
        "platforms": list(exported.platforms),
        "backbone": cfg.model.backbone,
    }
    meta_b = json.dumps(meta).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f_:
        f_.write(_MAGIC)
        f_.write(struct.pack("<I", len(meta_b)))
        f_.write(meta_b)
        f_.write(blob)
    return meta


def load_embed(path: str) -> Callable:
    """Load a serving artifact → callable(raw batch) → embeddings."""
    with open(path, "rb") as f_:
        magic = f_.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a crfr serving artifact")
        (mlen,) = struct.unpack("<I", f_.read(4))
        meta = json.loads(f_.read(mlen).decode())
        blob = f_.read()
    exported = jexport.deserialize(blob)

    def call(images):
        return exported.call(images)

    call.meta = meta          # type: ignore[attr-defined]
    return call


def read_meta(path: str) -> dict:
    with open(path, "rb") as f_:
        if f_.read(8) != _MAGIC:
            raise ValueError(f"{path}: not a crfr serving artifact")
        (mlen,) = struct.unpack("<I", f_.read(4))
        return json.loads(f_.read(mlen).decode())
