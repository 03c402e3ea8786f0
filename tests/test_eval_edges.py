"""Eval-protocol edge cases: degenerate label sets, tiny folds, empty
inputs — the places protocol code silently corrupts numbers."""

import numpy as np
import pytest

import jax.numpy as jnp

from crfr.eval.identification import (closed_set_identification,
                                      open_set_identification,
                                      streaming_topk)
from crfr.eval.verification import compute_eer, evaluate_verification


def test_verification_all_same(rng):
    e = rng.normal(0, 1, (40, 16)).astype(np.float32)
    res = evaluate_verification(e, e + rng.normal(0, 0.01, e.shape
                                                  ).astype(np.float32),
                                np.ones(40, bool), n_folds=4)
    assert res.accuracy_mean > 0.95          # trivially accept-all works


def test_verification_all_diff(rng):
    a = rng.normal(0, 1, (40, 16)).astype(np.float32)
    b = rng.normal(0, 1, (40, 16)).astype(np.float32)
    res = evaluate_verification(a, b, np.zeros(40, bool), n_folds=4)
    assert res.accuracy_mean > 0.95          # trivially reject-all works
    assert np.isnan(res.eer)                 # EER undefined without genuines


def test_eer_empty_classes():
    assert np.isnan(compute_eer(np.array([1.0, 2.0]), np.array([True, True])))


def test_closed_set_single_gallery_entry(rng):
    g = rng.normal(0, 1, (1, 8)).astype(np.float32)
    p = g + rng.normal(0, 0.01, (5, 8)).astype(np.float32)
    res = closed_set_identification(p, g, np.zeros(5, int), np.zeros(1, int),
                                    max_rank=3)
    assert res.rank1 == 1.0
    assert (res.cmc == 1.0).all()


def test_open_set_no_unmated(rng):
    g = rng.normal(0, 1, (4, 8)).astype(np.float32)
    p = g + rng.normal(0, 0.01, g.shape).astype(np.float32)
    res = open_set_identification(p, g, np.arange(4), np.arange(4),
                                  np.ones(4, bool), fpir_targets=(0.1,))
    assert res.rank1 == 1.0
    assert res.tpir_at_fpir[0.1] == 1.0      # threshold −1 accepts all


def test_open_set_no_mated(rng):
    g = rng.normal(0, 1, (4, 8)).astype(np.float32)
    p = rng.normal(0, 1, (6, 8)).astype(np.float32)
    res = open_set_identification(p, g, np.full(6, -1), np.arange(4),
                                  np.zeros(6, bool), fpir_targets=(0.1,))
    assert res.rank1 == 0.0 and res.tpir_at_fpir[0.1] == 0.0


def test_streaming_topk_k_larger_than_gallery(rng):
    p = rng.normal(0, 1, (3, 8)).astype(np.float32)
    g = rng.normal(0, 1, (5, 8)).astype(np.float32)
    s, l = streaming_topk(jnp.asarray(p), jnp.asarray(g),
                          jnp.arange(5), k=10, block=4)
    assert s.shape == (3, 10)
    # entries beyond the gallery stay -inf / -1
    assert np.isinf(np.asarray(s)[:, 5:]).all()
    assert (np.asarray(l)[:, 5:] == -1).all()


def test_extract_sharded_matches_unsharded(rng):
    """make_extract_fn(mesh=): a mesh-divisible batch runs the
    batch-sharded program, a ragged one the replicated program — both must
    produce the same embeddings (the divisible path is the 8× fix for
    GSPMD running the full batch on every device)."""
    import jax
    from flax import nnx

    from crfr.eval.extract import make_extract_fn
    from crfr.models import build_backbone
    from crfr.parallel.mesh import make_mesh

    bb = build_backbone("ir_18", input_size=32, dropout=0.0,
                        dtype=jnp.float32, rngs=nnx.Rngs(0))
    apply = lambda x: bb(x, train=False)                    # noqa: E731
    mesh = make_mesh()
    fn = make_extract_fn(apply, image_size=32, mesh=mesh)
    fn_plain = make_extract_fn(apply, image_size=32)
    x = rng.integers(0, 256, (16, 32, 32, 3)).astype(np.float32)
    e_sharded = np.asarray(fn(x))                           # 16 % 8 == 0
    e_ragged = np.asarray(fn(x[:11]))                       # fallback path
    e_plain = np.asarray(fn_plain(x))
    np.testing.assert_allclose(e_sharded, e_plain, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(e_ragged, e_plain[:11], rtol=2e-4, atol=2e-4)


def test_extract_small_set_batch_clamp(tmp_path, rng):
    """extract_embeddings must not pad a tiny path list to the serving
    batch (256): the padded zero rows were real forward FLOPs."""
    from PIL import Image

    from crfr.data.pipeline import embed_batches

    paths = []
    for i in range(5):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                        ).save(p)
        paths.append(str(p))

    seen = []
    from crfr.eval import extract as ex
    orig = ex.embed_batches

    def spy(paths_, batch_size, image_size):
        seen.append(batch_size)
        return orig(paths_, batch_size, image_size)

    ex.embed_batches = spy
    try:
        embs = ex.extract_embeddings(paths, lambda im: jnp.zeros((len(im), 4)),
                                     batch_size=256, image_size=32)
    finally:
        ex.embed_batches = orig
    assert seen == [8], seen                   # ceil(5/8)*8, not 256
    assert embs.shape == (5, 4)


def test_verification_fold_count_edge(rng):
    """n not divisible by folds: fold masks must still partition exactly."""
    a = rng.normal(0, 1, (23, 8)).astype(np.float32)
    b = rng.normal(0, 1, (23, 8)).astype(np.float32)
    res = evaluate_verification(a, b, rng.random(23) < 0.5, n_folds=5)
    assert len(res.fold_accuracies) == 5
    assert np.isfinite(res.accuracy_mean)
