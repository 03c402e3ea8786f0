"""Margin-softmax heads (ArcFace et al.) + class-sharded distributed CE.

Implements the BASELINE contract's "ArcFace-margin head": W ∈ ℝ^{D×C}, logits
s·cos(θ_yi + m) on the target class, s·cosθ elsewhere, softmax cross-entropy
(SURVEY.md §2.1). Margin families provided: arcface (additive angle),
cosface (additive cosine), sphereface (multiplicative angle), normsoftmax.

Numerical care (SURVEY.md §7 hard part #5): all margin trigonometry runs in
f32 even under a bf16 activation policy, with the standard θ+m>π guard
(fallback cosθ − m·sin m, or the easy-margin variant).

Distributed design (SURVEY.md §2.3): at MS1M scale (C ≈ 85k) the head is the
one model-parallel pressure point. ``sharded_margin_ce`` shards the CLASS axis
of W over the mesh's 'model' axis PartialFC-style with ``shard_map``: each
device computes logits against its class shard, applies the margin only if the
label lands in its shard, and the softmax-CE reduces globally with two scalar
collectives per example (pmax for the max, psum for the sum-exp) — the full
(B × C) logit matrix never exists on any one chip, and the collectives ride
ICI. Gradients flow through the same collectives (psum is its own transpose),
so one ``jax.grad`` over the shard-mapped loss trains W sharded in place.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / n


def cosine_logits(emb: jax.Array, weight: jax.Array) -> jax.Array:
    """cosθ = ê · Ŵ, f32. emb (B, D); weight (D, C) → (B, C)."""
    e = _l2_normalize(emb.astype(jnp.float32))
    w = _l2_normalize(weight.astype(jnp.float32), axis=0)
    # HIGHEST: true-f32 cosines on TPU (default would truncate to bf16 and
    # shift margin/threshold numerics beyond the parity budget).
    return jnp.dot(e, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _apply_margin(cos: jax.Array, is_target: jax.Array, *, margin_type: str,
                  m: float, easy_margin: bool) -> jax.Array:
    """Rewrite target-class cosines per margin family. cos is f32 in [-1, 1]."""
    cos = jnp.clip(cos, -1.0, 1.0)
    if margin_type == "normsoftmax" or m == 0.0:
        return cos
    if margin_type == "arcface":
        sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 0.0, 1.0))
        phi = cos * math.cos(m) - sin * math.sin(m)        # cos(θ+m)
        if easy_margin:
            phi = jnp.where(cos > 0, phi, cos)
        else:
            # θ+m > π would make the logit non-monotone; linear fallback.
            phi = jnp.where(cos > math.cos(math.pi - m),
                            phi, cos - m * math.sin(m))
        return jnp.where(is_target, phi, cos)
    if margin_type == "cosface":
        return jnp.where(is_target, cos - m, cos)
    if margin_type == "sphereface":
        # cos(mθ) with integer-ish m; implemented via Chebyshev on cosθ for
        # m in {2, 3, 4}; guarded monotone fallback outside [0, π/m].
        theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
        k = jnp.floor(theta * m / math.pi)
        phi = jnp.cos(m * theta) * ((-1.0) ** k) - 2.0 * k
        return jnp.where(is_target, phi, cos)
    raise ValueError(f"unknown margin_type {margin_type!r}")


def margin_logits(emb: jax.Array, weight: jax.Array, labels: jax.Array, *,
                  margin_type: str = "arcface", s: float = 64.0, m: float = 0.5,
                  easy_margin: bool = False,
                  num_valid: int | None = None) -> jax.Array:
    """Dense (unsharded) margin logits (B, C), f32, scaled by s.

    ``num_valid``: when W carries padding classes (class axis padded to a
    mesh-divisible size), classes ≥ num_valid are masked to −inf so ghost
    classes never enter the softmax denominator.
    """
    cos = cosine_logits(emb, weight)
    one_hot = jax.nn.one_hot(labels, weight.shape[1], dtype=jnp.bool_)
    phi = _apply_margin(cos, one_hot, margin_type=margin_type, m=m,
                        easy_margin=easy_margin)
    logits = phi * s
    if num_valid is not None and num_valid < weight.shape[1]:
        valid = jnp.arange(weight.shape[1]) < num_valid
        logits = jnp.where(valid[None, :], logits, -jnp.inf)
    return logits


def softmax_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy, numerically-stable logsumexp form."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(lse - tgt)


class MarginHead(nnx.Module):
    """Stateful head holding W (D, C); normalized-feature init à la torch
    ``nn.init.xavier_uniform_`` on the reference family's head."""

    def __init__(self, embedding_dim: int, num_classes: int, *,
                 margin_type: str = "arcface", s: float = 64.0, m: float = 0.5,
                 easy_margin: bool = False, num_valid: int | None = None,
                 rngs: nnx.Rngs):
        scale = math.sqrt(6.0 / (embedding_dim + num_classes))
        self.weight = nnx.Param(jax.random.uniform(
            rngs.params(), (embedding_dim, num_classes), jnp.float32,
            -scale, scale))
        self.margin_type = margin_type
        self.s = s
        self.m = m
        self.easy_margin = easy_margin
        self.num_valid = num_valid          # < num_classes when padded

    def __call__(self, emb: jax.Array, labels: jax.Array) -> jax.Array:
        return margin_logits(emb, self.weight.value, labels,
                             margin_type=self.margin_type, s=self.s, m=self.m,
                             easy_margin=self.easy_margin,
                             num_valid=self.num_valid)

    def loss(self, emb: jax.Array, labels: jax.Array) -> jax.Array:
        return softmax_ce(self(emb, labels), labels)


# ---------------------------------------------------------------------------
# Streaming margin CE — single-chip memory-bounded variant
# ---------------------------------------------------------------------------


def streaming_margin_ce(emb: jax.Array, weight: jax.Array, labels: jax.Array,
                        *, margin_type: str = "arcface", s: float = 64.0,
                        m: float = 0.5, easy_margin: bool = False,
                        block: int = 8192,
                        num_valid: int | None = None) -> jax.Array:
    """Margin-softmax CE WITHOUT materializing the (B, C) logit matrix.

    lax.scan streams over class blocks keeping a running (max, sum-exp,
    target-logit) triple per example — the flash-softmax pattern applied to
    the classifier head. Equivalent to the dense path (tested to 1e-5); use
    on a single chip when C is too large for a (B, C) f32 buffer (MS1M:
    B=512 × 85k ≈ 175 MB per materialization, ×grads). C is zero-padded to
    a block multiple with never-matching classes.

    Memory: O(B·block); compute: identical GEMM FLOPs, executed blockwise.
    """
    e = _l2_normalize(emb.astype(jnp.float32))                 # (B, D)
    w = _l2_normalize(weight.astype(jnp.float32), axis=0)      # (D, C)
    c = w.shape[1]
    c_valid = num_valid if num_valid is not None else c
    nblocks = -(-c // block)
    pad = nblocks * block - c
    w = jnp.pad(w, ((0, 0), (0, pad)))
    wb = w.reshape(w.shape[0], nblocks, block).transpose(1, 0, 2)  # (N,D,blk)
    valid = (jnp.arange(nblocks * block) < c_valid).reshape(nblocks, block)
    labels = labels.astype(jnp.int32)
    b = e.shape[0]

    init = (jnp.full((b,), -jnp.inf), jnp.zeros((b,)), jnp.zeros((b,)))

    def step(carry, xs):
        run_max, run_sum, tgt = carry
        w_blk, valid_blk, blk_idx = xs
        cos = jnp.dot(e, w_blk, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)     # (B, blk)
        offset = blk_idx * block
        local = labels - offset
        in_blk = (local >= 0) & (local < block)
        one_hot = (jax.nn.one_hot(jnp.where(in_blk, local, 0), block,
                                  dtype=jnp.bool_)
                   & in_blk[:, None])
        phi = _apply_margin(cos, one_hot, margin_type=margin_type, m=m,
                            easy_margin=easy_margin)
        logits = jnp.where(valid_blk[None, :], phi * s, -jnp.inf)
        blk_max = jnp.max(logits, axis=1)
        new_max = jnp.maximum(run_max, jax.lax.stop_gradient(blk_max))
        # rescale previous sum to the new max; -inf-safe via where
        scale_old = jnp.where(jnp.isfinite(run_max),
                              jnp.exp(run_max - new_max), 0.0)
        blk_sum = jnp.sum(jnp.where(valid_blk[None, :],
                                    jnp.exp(logits - new_max[:, None]), 0.0),
                          axis=1)
        new_sum = run_sum * scale_old + blk_sum
        tgt = tgt + jnp.sum(jnp.where(one_hot, phi * s, 0.0), axis=1)
        return (new_max, new_sum, tgt), None

    (gmax, gsum, tgt), _ = jax.lax.scan(
        step, init, (wb, valid, jnp.arange(nblocks)))
    lse = gmax + jnp.log(gsum)
    return jnp.mean(lse - tgt)


# ---------------------------------------------------------------------------
# Class-sharded (PartialFC-style) margin CE
# ---------------------------------------------------------------------------


def _sharded_ce_body(emb, labels, weight, *, axis: str, margin_type: str,
                     s: float, m: float, easy_margin: bool,
                     num_valid: int | None = None):
    """Per-shard body under shard_map.

    emb (B_local, D) — sharded over 'data', replicated over 'model'.
    labels (B_local,) int32 global class ids.
    weight (D, C_local) — this device's class shard.
    Returns per-example CE (B_local,), still sharded over 'data'.
    """
    shard = jax.lax.axis_index(axis)
    c_local = weight.shape[1]
    offset = shard * c_local

    cos = cosine_logits(emb, weight)                      # (B, C_local) f32
    local_label = labels - offset
    in_shard = (local_label >= 0) & (local_label < c_local)
    one_hot = jax.nn.one_hot(jnp.where(in_shard, local_label, 0),
                             c_local, dtype=jnp.bool_) & in_shard[:, None]
    phi = _apply_margin(cos, one_hot, margin_type=margin_type, m=m,
                        easy_margin=easy_margin)
    logits = phi * s                                       # (B, C_local)
    if num_valid is not None:
        # mask padding classes (global index ≥ num_valid) out of the softmax
        gidx = offset + jnp.arange(c_local)
        logits = jnp.where((gidx < num_valid)[None, :], logits, -jnp.inf)

    # Global logsumexp via two collectives over the class shards.
    local_max = jnp.max(logits, axis=1)
    # stop_gradient: the global max is a stability offset only (cancels in
    # softmax), and pmax has no differentiation rule — the CE gradient flows
    # through exp(l − gmax)/gsum exactly as in the dense path.
    gmax = jax.lax.pmax(jax.lax.stop_gradient(local_max), axis)
    sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=1)
    gsum = jax.lax.psum(sumexp, axis)
    lse = gmax + jnp.log(gsum)

    tgt_local = jnp.sum(jnp.where(one_hot, logits, 0.0), axis=1)
    tgt = jax.lax.psum(tgt_local, axis)                    # exactly one shard hits
    return lse - tgt


def sharded_margin_ce(mesh: Mesh, *, margin_type: str = "arcface",
                      s: float = 64.0, m: float = 0.5,
                      easy_margin: bool = False,
                      num_valid: int | None = None):
    """Build the shard-mapped CE: (emb, labels, W_sharded) → mean loss.

    W must be laid out P(None, 'model'); emb P('data', None); labels P('data').
    C must divide evenly over the model axis — pad classes to a multiple with
    never-used ids (crfr.parallel.mesh.pad_to_multiple).
    """
    data_ax, model_ax = mesh.axis_names

    body = partial(_sharded_ce_body, axis=model_ax, margin_type=margin_type,
                   s=s, m=m, easy_margin=easy_margin, num_valid=num_valid)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(data_ax, None), P(data_ax), P(None, model_ax)),
        out_specs=P(data_ax),
        check_rep=False,
    )

    def loss_fn(emb, labels, weight):
        return jnp.mean(fn(emb, labels.astype(jnp.int32), weight))

    return loss_fn
