"""Regression tests for the round-1 self-review findings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_wd_mask_covers_head_weight():
    """The weight-decay mask must include the ArcFace head W (path ends in
    'weight/value', which a suffix check silently missed)."""
    from flax import nnx

    from crfr.configs import Config, DataCfg, ModelCfg
    from crfr.train.loop import FaceTrainModel, _wd_mask

    cfg = Config(data=DataCfg(image_size=32, num_classes=4),
                 model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                                input_size=32))
    model = FaceTrainModel(cfg, rngs=nnx.Rngs(0))
    params = nnx.state(model, nnx.Param)
    mask = _wd_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    decided = {"/".join(str(getattr(p, "name", getattr(p, "key", p)))
                        for p in path): v for path, v in flat}
    head_keys = [k for k in decided if "head" in k and "weight" in k]
    assert head_keys and all(decided[k] for k in head_keys), decided
    bn_scale = [k for k in decided if "bn" in k and "scale" in k]
    assert bn_scale and not any(decided[k] for k in bn_scale)
    kernels = [k for k in decided if "kernel" in k]
    assert kernels and all(decided[k] for k in kernels)


def test_tar_at_far_exact_impostor_count():
    """thr must admit EXACTLY k = floor(tgt·n) impostors (strict '>')."""
    from crfr.eval.ijbc import tar_at_far_exact

    neg = np.linspace(0, 1, 100, endpoint=False)      # 100 distinct impostors
    pos = np.linspace(0, 1, 100, endpoint=False) + 5e-3  # interleaved genuines
    scores = np.concatenate([pos, neg])
    issame = np.concatenate([np.ones(100, bool), np.zeros(100, bool)])
    for tgt, k in ((0.05, 5), (0.01, 1), (0.001, 0)):
        thr = np.sort(neg)[::-1][k] if k < 100 else -np.inf
        want_tar = float((pos > thr).mean())
        got = tar_at_far_exact(scores, issame, (tgt,))[tgt]
        assert got == want_tar
        # impostor count at that threshold is exactly k
        assert int((neg > thr).sum()) == k


def test_open_set_fpir_exact(rng):
    """FPIR threshold admits exactly floor(tgt·n) unmated probes."""
    from crfr.eval.identification import open_set_identification

    d = 8
    g = np.eye(4, d).astype(np.float32)
    # mated probes: perfectly matching gallery → top_sim 1.0, correct
    mated_p = g[:4].copy()
    # unmated probes with CONTROLLED top similarities: scale copies of g[0]
    sims = np.linspace(0.1, 0.9, 100)
    unmated_p = np.stack([g[0] * s + (1 - s) * 0.01 * rng.normal(0, 1, d)
                          for s in sims]).astype(np.float32)
    probes = np.concatenate([mated_p, unmated_p])
    plabels = np.concatenate([np.arange(4), np.full(100, -1)])
    mated = np.concatenate([np.ones(4, bool), np.zeros(100, bool)])
    res = open_set_identification(probes, g, plabels, g_labels(4), mated,
                                  fpir_targets=(0.05,))
    # all mated probes score 1.0 > any unmated tau → TPIR = 1 at FPIR 0.05
    assert res.tpir_at_fpir[0.05] == 1.0


def g_labels(n):
    return np.arange(n)


def test_fixed_degradation_is_applied():
    """degrade_min == degrade_max must still degrade (was skipped)."""
    from crfr.configs import Config, DataCfg, LossCfg, MeshCfg, ModelCfg, TrainCfg
    from crfr.data.synthetic import SyntheticFaces
    from crfr.train.loop import Trainer

    def cfg_for(lo, hi):
        return Config(
            mesh=MeshCfg(data=8),
            data=DataCfg(image_size=32, num_classes=4, degrade_min=lo,
                         degrade_max=hi),
            model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                           dropout=0.0, input_size=32),
            loss=LossCfg(scale=16.0, margin=0.2),
            train=TrainCfg(batch_size=8, warmup_steps=2, weight_decay=0.0))

    data = SyntheticFaces(num_classes=4, image_size=32, seed=0,
                          fine_detail=True)
    imgs, labels = next(data.batches(8, 1, seed=1))
    losses = {}
    for name, (lo, hi) in (("deg8", (8, 8)), ("identity", (32, 32))):
        tr = Trainer(cfg_for(lo, hi), steps_per_epoch=10)
        assert tr._degrade_lows == [lo]
        m = tr.train_step(imgs, labels)
        losses[name] = float(jax.device_get(m["loss"]))
    # same init/seed/batch: the ONLY difference is the degradation operator,
    # so the losses must differ if degradation is actually applied.
    assert abs(losses["deg8"] - losses["identity"]) > 1e-4, losses


def test_step_schedule_warmup_offset():
    """LR drops configured at epoch boundaries fire at GLOBAL steps."""
    from crfr.configs import Config, TrainCfg
    from crfr.train.loop import lr_schedule

    cfg = Config(train=TrainCfg(lr=0.1, warmup_steps=100,
                                lr_drop_epochs=(2,), lr_drop_factor=0.1))
    s = lr_schedule(cfg, steps_per_epoch=100)
    assert float(s(199)) == pytest.approx(0.1)
    assert float(s(201)) == pytest.approx(0.01)       # drop AT step 200
