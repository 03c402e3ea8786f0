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


def test_verification_fold_count_edge(rng):
    """n not divisible by folds: fold masks must still partition exactly."""
    a = rng.normal(0, 1, (23, 8)).astype(np.float32)
    b = rng.normal(0, 1, (23, 8)).astype(np.float32)
    res = evaluate_verification(a, b, rng.random(23) < 0.5, n_folds=5)
    assert len(res.fold_accuracies) == 5
    assert np.isfinite(res.accuracy_mean)
