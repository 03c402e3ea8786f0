"""ArcFace margin-head numerics: oracle parity, sharded==dense, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from crfr.losses.arcface import (
    MarginHead,
    cosine_logits,
    margin_logits,
    sharded_margin_ce,
    softmax_ce,
)
from crfr.parallel.mesh import make_mesh
from crfr.configs import MeshCfg


def _numpy_arcface(emb, w, labels, s=64.0, m=0.5, easy=False):
    """Independent float64 oracle from the ArcFace equations."""
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=0, keepdims=True)
    cos = np.clip(e @ wn, -1, 1)
    sin = np.sqrt(np.clip(1 - cos ** 2, 0, 1))
    phi = cos * np.cos(m) - sin * np.sin(m)
    if easy:
        phi = np.where(cos > 0, phi, cos)
    else:
        phi = np.where(cos > np.cos(np.pi - m), phi, cos - m * np.sin(m))
    out = cos.copy()
    out[np.arange(len(labels)), labels] = phi[np.arange(len(labels)), labels]
    return out * s


@pytest.mark.parametrize("easy", [False, True])
def test_margin_logits_oracle(rng, easy):
    B, D, C = 16, 32, 40
    emb = rng.normal(0, 1, (B, D)).astype(np.float32)
    w = rng.normal(0, 1, (D, C)).astype(np.float32)
    labels = rng.integers(0, C, B)
    ours = np.asarray(margin_logits(jnp.asarray(emb), jnp.asarray(w),
                                    jnp.asarray(labels), easy_margin=easy))
    ref = _numpy_arcface(emb.astype(np.float64), w.astype(np.float64), labels,
                         easy=easy)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_margin_increases_loss(rng):
    """Margin must make the target logit strictly harder (higher CE)."""
    B, D, C = 8, 16, 24
    emb = jnp.asarray(rng.normal(0, 1, (B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (D, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))
    lm = softmax_ce(margin_logits(emb, w, labels, m=0.5), labels)
    l0 = softmax_ce(margin_logits(emb, w, labels, m=0.0), labels)
    assert float(lm) > float(l0)


def test_cosface_sphereface_run(rng):
    B, D, C = 4, 8, 12
    emb = jnp.asarray(rng.normal(0, 1, (B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (D, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))
    for mt, m in [("cosface", 0.35), ("sphereface", 2.0), ("normsoftmax", 0.0)]:
        lg = margin_logits(emb, w, labels, margin_type=mt, m=m)
        assert np.isfinite(np.asarray(lg)).all()


def test_head_module(rng):
    head = MarginHead(32, 50, rngs=nnx.Rngs(0))
    emb = jnp.asarray(rng.normal(0, 1, (4, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 50, 4))
    loss = head.loss(emb, labels)
    assert np.isfinite(float(loss))


def test_streaming_ce_matches_dense(rng):
    from crfr.losses.arcface import streaming_margin_ce

    B, D, C = 16, 32, 100           # non-multiple of block on purpose
    emb = jnp.asarray(rng.normal(0, 1, (B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (D, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))

    def dense(emb, w):
        return softmax_ce(margin_logits(emb, w, labels), labels)

    def stream(emb, w):
        return streaming_margin_ce(emb, w, labels, block=32)

    assert abs(float(stream(emb, w)) - float(dense(emb, w))) < 1e-5
    gs = jax.grad(stream, argnums=(0, 1))(emb, w)
    gd = jax.grad(dense, argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]), atol=1e-5)


# --------------------------- sharded CE ------------------------------------


def test_sharded_ce_matches_dense(rng):
    """8-device (2 data × 4 model) mesh: PartialFC CE == dense CE, and the
    gradients w.r.t. both the class-sharded W and the embeddings match."""
    mesh = make_mesh(MeshCfg(data=2, model=4))
    B, D, C = 16, 32, 64
    emb = rng.normal(0, 1, (B, D)).astype(np.float32)
    w = rng.normal(0, 1, (D, C)).astype(np.float32)
    labels = rng.integers(0, C, B).astype(np.int32)

    loss_sharded = sharded_margin_ce(mesh)

    def dense(emb, labels, w):
        return softmax_ce(margin_logits(emb, w, labels), labels)

    je, jl, jw = jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(w)
    ls = float(loss_sharded(je, jl, jw))
    ld = float(dense(je, jl, jw))
    assert abs(ls - ld) < 1e-4, (ls, ld)

    gs = jax.grad(loss_sharded, argnums=(0, 2))(je, jl, jw)
    gd = jax.grad(dense, argnums=(0, 2))(je, jl, jw)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]), atol=1e-5)


def test_sharded_ce_label_on_every_shard(rng):
    """Each shard's margin path must fire only for its own labels — cover
    labels in every shard, including shard boundaries."""
    mesh = make_mesh(MeshCfg(data=2, model=4))
    B, D, C = 8, 16, 32
    emb = rng.normal(0, 1, (B, D)).astype(np.float32)
    w = rng.normal(0, 1, (D, C)).astype(np.float32)
    labels = np.array([0, 7, 8, 15, 16, 23, 24, 31], np.int32)

    loss_sharded = sharded_margin_ce(mesh)

    def dense(emb, labels, w):
        return softmax_ce(margin_logits(emb, w, labels), labels)

    ls = float(loss_sharded(jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(w)))
    ld = float(dense(jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(w)))
    assert abs(ls - ld) < 1e-4


@pytest.mark.slow
def test_partialfc_ms1m_class_count(rng):
    """BASELINE config 5's class count (C=85742) through the class-sharded
    PartialFC CE on the 8-way model mesh: loss and gradients must match the
    streaming flash-softmax golden (the single-chip implementation measured
    in BASELINE.md §ms1m-scale), with the class axis padded to the mesh
    multiple and ghost classes masked via num_valid."""
    from crfr.losses.arcface import streaming_margin_ce
    from crfr.parallel.mesh import pad_to_multiple

    mesh = make_mesh(MeshCfg(data=1, model=8))
    B, D, C = 16, 512, 85742
    c_pad = pad_to_multiple(C, 8)
    assert c_pad % 8 == 0 and c_pad >= C
    emb = rng.normal(0, 1, (B, D)).astype(np.float32)
    w = rng.normal(0, 1, (D, c_pad)).astype(np.float32)
    labels = np.concatenate([
        rng.integers(0, C, B - 3),
        [0, C - 1, C // 2],                    # shard-boundary coverage
    ]).astype(np.int32)

    loss_sharded = sharded_margin_ce(mesh, num_valid=C)

    def stream(emb, labels, w):
        return streaming_margin_ce(emb, w, labels, num_valid=C)

    je, jl, jw = jnp.asarray(emb), jnp.asarray(labels), jnp.asarray(w)
    ls = float(loss_sharded(je, jl, jw))
    lg = float(stream(je, jl, jw))
    assert abs(ls - lg) < 1e-4, (ls, lg)

    gs = jax.grad(loss_sharded, argnums=(0, 2))(je, jl, jw)
    gg = jax.grad(stream, argnums=(0, 2))(je, jl, jw)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gg[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gg[1]),
                               atol=2e-5)
    # ghost classes (C..c_pad) must receive zero gradient
    tail = np.asarray(gs[1])[:, C:]
    assert np.abs(tail).max() == 0.0
