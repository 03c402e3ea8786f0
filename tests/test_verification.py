"""Eval-protocol fidelity tests: synthetic embeddings with a KNOWN optimal
threshold must be recovered; identification with known answers (SURVEY.md §4)."""

import numpy as np

import jax.numpy as jnp
from crfr.eval.verification import (evaluate_verification, fuse_flip_features,
                                    pair_distances)
from crfr.eval.identification import (closed_set_identification,
                                      open_set_identification,
                                      streaming_topk)


def _synthetic_pairs(rng, n=600, d=64, pos_cos=0.8, neg_cos=0.1, noise=0.05):
    """Pairs whose cosine is ~pos_cos for same, ~neg_cos for diff."""
    a = rng.normal(0, 1, (n, d))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    issame = rng.random(n) < 0.5
    tgt = np.where(issame, pos_cos, neg_cos)
    # construct b with exact cosine tgt to a, then add noise
    r = rng.normal(0, 1, (n, d))
    r -= (r * a).sum(1, keepdims=True) * a
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    b = tgt[:, None] * a + np.sqrt(1 - tgt[:, None] ** 2) * r
    b += rng.normal(0, noise, b.shape)
    return a.astype(np.float32), b.astype(np.float32), issame


def test_recovers_known_threshold(rng):
    a, b, issame = _synthetic_pairs(rng)
    res = evaluate_verification(a, b, issame)
    # separable: accuracy near 1, threshold between the two distance modes
    # d_pos = 2-2(0.8)=0.4, d_neg = 2-2(0.1)=1.8
    assert res.accuracy_mean > 0.97, res.accuracy_mean
    assert 0.45 < res.best_thresholds.mean() < 1.8, res.best_thresholds


def test_chance_level(rng):
    emb = rng.normal(0, 1, (400, 64)).astype(np.float32)
    emb2 = rng.normal(0, 1, (400, 64)).astype(np.float32)
    issame = rng.random(400) < 0.5
    res = evaluate_verification(emb, emb2, issame)
    assert 0.35 < res.accuracy_mean < 0.65


def test_tar_at_far_calibration(rng):
    a, b, issame = _synthetic_pairs(rng, n=2000, noise=0.15)
    res = evaluate_verification(a, b, issame, far_targets=(0.01,))
    # with good separation TAR should be high and far near target
    assert res.tar_at_far[0.01] > 0.9


def test_flip_fusion_modes(rng):
    e = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
    f = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
    assert fuse_flip_features(e, f, "sum").shape == (4, 8)
    assert fuse_flip_features(e, f, "concat").shape == (4, 16)


def test_pair_distance_range(rng):
    e = jnp.asarray(rng.normal(0, 1, (10, 16)), jnp.float32)
    d = np.asarray(pair_distances(e, e))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)
    d2 = np.asarray(pair_distances(e, -e))
    np.testing.assert_allclose(d2, 4.0, atol=1e-5)


# ------------------------- identification ----------------------------------


def test_closed_set_perfect(rng):
    g = rng.normal(0, 1, (20, 32)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    glabels = np.arange(20)
    probes = g + rng.normal(0, 0.05, g.shape).astype(np.float32)
    res = closed_set_identification(probes, g, glabels, glabels)
    assert res.rank1 > 0.95
    assert res.cmc[-1] >= res.cmc[0]
    assert np.all(np.diff(res.cmc) >= -1e-9)      # CMC monotone


def test_closed_set_known_rank(rng):
    """Probe exactly between two gallery entries but closer to wrong one →
    rank-1 miss, rank-2 hit."""
    g = np.eye(4, dtype=np.float32)
    glabels = np.arange(4)
    probe = np.array([[0.4, 1.0, 0, 0]], np.float32)   # closest to id 1
    res = closed_set_identification(probe, g, np.array([0]), glabels)
    assert res.rank1 == 0.0
    assert res.cmc[1] == 1.0                            # rank-2 hit


def test_open_set_tpir(rng):
    d = 32
    g = rng.normal(0, 1, (10, d)).astype(np.float32)
    glabels = np.arange(10)
    mated_p = g[:5] + rng.normal(0, 0.02, (5, d)).astype(np.float32)
    unmated_p = rng.normal(0, 1, (50, d)).astype(np.float32)
    probes = np.concatenate([mated_p, unmated_p])
    plabels = np.concatenate([np.arange(5), np.full(50, -1)])
    mated = np.concatenate([np.ones(5, bool), np.zeros(50, bool)])
    res = open_set_identification(probes, g, plabels, glabels, mated,
                                  fpir_targets=(0.1,))
    assert res.rank1 == 1.0
    assert res.tpir_at_fpir[0.1] >= 0.8


def test_streaming_topk_matches_dense(rng):
    n, m, d, k = 16, 1000, 32, 5
    p = rng.normal(0, 1, (n, d)).astype(np.float32)
    g = rng.normal(0, 1, (m, d)).astype(np.float32)
    lbl = rng.integers(0, 100, m)
    s, l = streaming_topk(jnp.asarray(p), jnp.asarray(g), jnp.asarray(lbl),
                          k=k, block=128)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    sim = pn @ gn.T
    idx = np.argsort(-sim, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(s),
                               np.take_along_axis(sim, idx, axis=1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(l), lbl[idx])


def test_sharded_topk_matches_dense(rng):
    from crfr.parallel.mesh import make_mesh
    from crfr.configs import MeshCfg
    from crfr.eval.identification import sharded_topk

    mesh = make_mesh(MeshCfg(data=4, model=2))
    n, m, d, k = 8, 512, 16, 4
    p = rng.normal(0, 1, (n, d)).astype(np.float32)
    g = rng.normal(0, 1, (m, d)).astype(np.float32)
    lbl = rng.integers(0, 60, m)
    fn = sharded_topk(mesh, k=k, block=32)
    s, l = fn(jnp.asarray(p), jnp.asarray(g), jnp.asarray(lbl))
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    sim = pn @ gn.T
    idx = np.argsort(-sim, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(s),
                               np.take_along_axis(sim, idx, axis=1), atol=1e-4)
