"""MS1M-shape class-count exercise (r3 VERDICT Next #4, CPU-mesh half).

BASELINE config 5 trains at C≈85k classes. Before real data ever arrives,
prove the head paths run AND agree at that exact shape: the PartialFC
class-sharded CE on the 8-device mesh equals the single-chip streaming
(flash-softmax) CE — loss and gradients — at C=85742, with labels placed
on every shard including both edges of each class shard.

The real-chip half (step time / HBM headroom at C=85k, b256 IR-50) is a
measured row in BASELINE.md §ms1m-scale, produced by scripts/ms1m_scale.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crfr.configs import MeshCfg
from crfr.losses.arcface import sharded_margin_ce, streaming_margin_ce
from crfr.parallel.mesh import make_mesh, pad_to_multiple

C_MS1M = 85742            # MS1MV2 identity count (BASELINE config 5)
D, B = 512, 16


@pytest.mark.slow
def test_partialfc_ms1m_count_matches_streaming(rng):
    """loss AND grad(W) agree between the 4-way class-sharded PartialFC CE
    and the streaming golden at the full MS1M class count (padded +2 to
    divide the model axis; padding classes masked via num_valid)."""
    mesh = make_mesh(MeshCfg(data=2, model=4))
    c_pad = pad_to_multiple(C_MS1M, 4)
    assert c_pad == 85744 and c_pad != C_MS1M

    emb = jnp.asarray(rng.normal(0, 1, (B, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (D, c_pad)), jnp.float32)
    shard = c_pad // 4
    labels = jnp.asarray(
        [0, 1, shard - 1, shard, 2 * shard - 1, 2 * shard,
         3 * shard - 1, 3 * shard, c_pad - 3, C_MS1M - 1,
         5, 17, 123456 % C_MS1M, 54321, 80000, 42], jnp.int32)

    loss_sharded = sharded_margin_ce(mesh, num_valid=C_MS1M)

    def stream(emb, labels, w):
        return streaming_margin_ce(emb, w, labels, num_valid=C_MS1M)

    ls, gs = jax.jit(jax.value_and_grad(loss_sharded, argnums=2))(
        emb, labels, w)
    lt, gt = jax.jit(jax.value_and_grad(stream, argnums=2))(emb, labels, w)
    assert abs(float(ls) - float(lt)) < 1e-4, (float(ls), float(lt))
    # grad is (D, 85744); compare exactly — the margin path must fire for
    # every label's home shard and nowhere else
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gt), atol=2e-5)
    # padding classes get zero gradient under both implementations
    assert np.abs(np.asarray(gs)[:, C_MS1M:]).max() == 0.0


@pytest.mark.slow
def test_streaming_ce_ms1m_blocking(rng):
    """The streaming scan's block structure is invariant at the MS1M count:
    block 8192 (11 blocks, padded tail) == block 85744 (single block)."""
    emb = jnp.asarray(rng.normal(0, 1, (4, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (D, C_MS1M)), jnp.float32)
    labels = jnp.asarray([0, 85741, 8192, 8191], jnp.int32)
    a = streaming_margin_ce(emb, w, labels, block=8192)
    b = streaming_margin_ce(emb, w, labels, block=C_MS1M)
    assert abs(float(a) - float(b)) < 1e-4
