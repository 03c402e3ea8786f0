"""Embedding-extraction throughput harness — the BASELINE north-star metric.

Measures imgs/sec/chip for the full hot path of SURVEY.md §3.3: 16×16→112
bicubic probe degradation + (x−127.5)/128 normalization + IR-50 embedding,
as ONE jitted graph on device (degradation is a precomposed 112×112 operator
pair → two matmuls feeding the conv stack; XLA fuses normalize into them).

Methodology: async dispatch of `steps` batches with a single
block_until_ready fence at the end (measures sustained device throughput,
not per-call host latency); warmup excluded; median of repeats reported.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from crfr.models.irse import build_backbone
from crfr.ops.bicubic import degrade_matrix
from crfr.ops.normalize import MEAN, STD


@dataclass
class BenchResult:
    imgs_per_sec: float
    batch: int
    steps: int
    compile_seconds: float
    per_batch_ms: float


def build_embed_pipeline(backbone_name: str = "ir_50", degrade_to: int = 16,
                         image_size: int = 112, mode: str = "pil",
                         dtype=jnp.bfloat16):
    """→ jitted fn(raw uint8/f32 NHWC batch) → (B, 512) f32 embeddings."""
    model = build_backbone(backbone_name, input_size=image_size,
                           rngs=nnx.Rngs(0), dtype=dtype)
    graphdef, state = nnx.split(model)
    w = jnp.asarray(degrade_matrix(image_size, degrade_to, mode))
    # bf16 degrade operator: the backbone consumes bf16 anyway and the
    # operator rows sum to 1, so bf16 keeps ~2 decimal digits of pixel
    # accuracy — the accuracy-parity eval path uses the f32 ops module.
    wb = w.astype(dtype)

    @jax.jit
    def embed(x):
        m = nnx.merge(graphdef, state)
        x = x.astype(dtype)
        x = jnp.einsum("oi,bijc,pj->bopc", wb, x, wb,
                       preferred_element_type=dtype)
        x = (x - jnp.asarray(MEAN, dtype)) * jnp.asarray(1.0 / STD, dtype)
        return m(x, train=False)

    return embed


def run_throughput(batch: int = 256, steps: int = 30, repeats: int = 3,
                   backbone: str = "ir_50", degrade_to: int = 16,
                   image_size: int = 112) -> BenchResult:
    embed = build_embed_pipeline(backbone, degrade_to, image_size)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, image_size, image_size, 3)),
                    jnp.float32)

    t0 = time.perf_counter()
    jax.block_until_ready(embed(x))
    compile_s = time.perf_counter() - t0

    best = 0.0
    for _ in range(repeats):
        jax.block_until_ready(embed(x))          # re-warm
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = embed(x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)
    return BenchResult(imgs_per_sec=best, batch=batch, steps=steps,
                       compile_seconds=compile_s,
                       per_batch_ms=1e3 * batch / best)
