"""Exact data-pipeline resume, cosine schedule, per-sample degradation."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_grain_iterator_state_resume(tmp_path, rng):
    from crfr.data.pipeline import PipelineCfg, train_batches
    from crfr.data.records import open_source, write_pack

    recs = [(i % 3, rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
            for i in range(40)]
    p = str(tmp_path / "t.crfrpack")
    write_pack(p, iter(recs))
    src = open_source(p)
    cfg = PipelineCfg(batch_size=4, seed=0)

    it = train_batches(src, cfg)
    for _ in range(3):
        next(it)
    state = it.get_state()
    want = [next(it)[1] for _ in range(3)]        # the next 3 label arrays

    it2 = train_batches(src, cfg, state=json.loads(json.dumps(state)))
    got = [next(it2)[1] for _ in range(3)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)

    # skip-based fallback agrees too
    it3 = train_batches(src, cfg, start_step=3)
    got3 = [next(it3)[1] for _ in range(3)]
    for a, b in zip(want, got3):
        np.testing.assert_array_equal(a, b)


def test_cosine_schedule():
    from crfr.configs import Config, TrainCfg
    from crfr.train.loop import lr_schedule

    cfg = Config(train=TrainCfg(lr=0.1, warmup_steps=10, epochs=2,
                                schedule="cosine"))
    s = lr_schedule(cfg, steps_per_epoch=100)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(0.1, rel=1e-3)
    assert float(s(105)) < 0.1
    assert float(s(209)) < 0.01          # near the end of the cosine


def test_per_sample_degrade_differs_within_batch(rng):
    """With per-sample degradation two identical images in one batch get
    different random resolutions (almost surely)."""
    from crfr.configs import Config, DataCfg, LossCfg, ModelCfg, TrainCfg
    from crfr.train.loop import Trainer

    cfg = Config(
        name="ps", data=DataCfg(image_size=32, num_classes=4, degrade_min=4,
                                degrade_max=32, per_sample_degrade=True),
        model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                       dropout=0.0, input_size=32),
        loss=LossCfg(scale=16.0, margin=0.2),
        train=TrainCfg(batch_size=8, warmup_steps=2))
    tr = Trainer(cfg, steps_per_epoch=10)
    # use the internal table directly to check the per-sample einsum shape
    key = jax.random.key(0)
    idx = jax.random.randint(key, (8,), 0, len(tr._degrade_lows))
    assert len(set(np.asarray(idx).tolist())) > 1
    w = tr._degrade_table[idx]
    assert w.shape == (8, 32, 32)
    x = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)), jnp.float32)
    out = jnp.einsum("boi,bijc,bpj->bopc", w, x, w)
    assert out.shape == x.shape
    # and a full train step runs with the per-sample path
    m = tr.train_step(np.asarray(x), np.zeros(8, np.int32))
    assert np.isfinite(float(jax.device_get(m["loss"])))
