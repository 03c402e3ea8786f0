"""Integration: synthetic-dataset training must learn; DP + sharded-head
step runs on the 8-device mesh; checkpoint save→restore→bitwise next step.
(SURVEY.md §4 items 2–3.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from crfr.configs import Config, DataCfg, MeshCfg, ModelCfg, TrainCfg, LossCfg
from crfr.data.synthetic import SyntheticFaces
from crfr.parallel.mesh import make_mesh
from crfr.train.loop import Trainer


def _tiny_cfg(mesh=MeshCfg(data=8, model=1), num_classes=4, size=32):
    return Config(
        name="tiny-test",
        mesh=mesh,
        data=DataCfg(image_size=size, num_classes=num_classes,
                     degrade_min=size // 2, degrade_max=size),
        model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                       dropout=0.0, input_size=size),
        loss=LossCfg(scale=16.0, margin=0.2),
        train=TrainCfg(batch_size=16, lr=0.05, warmup_steps=5,
                       weight_decay=5e-4, log_every=10, seed=0),
    )


@pytest.fixture
def trained(trained_session):
    """Session-shared trained model (conftest) — (cfg, data, tr, losses)."""
    return trained_session


def test_loss_decreases(trained):
    _, _, _, losses = trained
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7, (
        losses[:5], losses[-5:])


def test_learns_verification(trained):
    cfg, data, tr, _ = trained
    rng = np.random.default_rng(5)
    i1, i2, issame = data.eval_pairs(rng, 64)
    embed = tr.embed_fn()
    e1 = embed(jnp.asarray(i1))
    e2 = embed(jnp.asarray(i2))
    from crfr.eval import evaluate_verification
    res = evaluate_verification(e1, e2, issame, n_folds=4)
    assert res.accuracy_mean > 0.75, res.accuracy_mean


def test_sharded_head_step_runs():
    """mesh (4 data × 2 model): class-sharded head trains; W stays sharded."""
    cfg = _tiny_cfg(mesh=MeshCfg(data=4, model=2), num_classes=6)
    data = SyntheticFaces(num_classes=6, image_size=32, seed=2)
    tr = Trainer(cfg, steps_per_epoch=100)
    w = tr.state["params"]["head"]["weight"].value
    assert not w.sharding.is_fully_replicated
    first = None
    for imgs, labels in data.batches(16, 5, seed=3):
        m = tr.train_step(imgs, labels)
        loss = float(jax.device_get(m["loss"]))
        assert np.isfinite(loss)
        first = first if first is not None else loss
    w2 = tr.state["params"]["head"]["weight"].value
    assert not w2.sharding.is_fully_replicated


def test_sharded_head_matches_dense_step():
    """First-step loss with model=2 sharded head == model=1 dense head —
    including a class count (7) that does NOT divide the model axis, so the
    padded ghost classes must be masked out of the softmax."""
    import jax.numpy as jnp
    from crfr.parallel.mesh import class_sharding

    data = SyntheticFaces(num_classes=7, image_size=32, seed=2)
    imgs, labels = next(data.batches(16, 1, seed=4))

    dense = Trainer(_tiny_cfg(mesh=MeshCfg(data=8, model=1), num_classes=7),
                    steps_per_epoch=100)
    sharded = Trainer(_tiny_cfg(mesh=MeshCfg(data=4, model=2), num_classes=7),
                      steps_per_epoch=100)
    # head W inits differ (7 vs padded-8 columns) — copy dense W into the
    # sharded head's valid columns so only the CE implementation differs.
    wd = np.asarray(dense.state["params"]["head"]["weight"].value)
    ws = np.array(sharded.state["params"]["head"]["weight"].value)  # copy
    ws[:, :7] = wd
    sharded.state["params"]["head"]["weight"].value = jax.device_put(
        jnp.asarray(ws), class_sharding(sharded.mesh))

    l_dense = float(jax.device_get(dense.train_step(imgs, labels)["loss"]))
    l_shard = float(jax.device_get(sharded.train_step(imgs, labels)["loss"]))
    assert abs(l_dense - l_shard) < 1e-3, (l_dense, l_shard)


def test_checkpoint_roundtrip(tmp_path):
    from crfr.train.checkpoints import Checkpointer

    cfg = _tiny_cfg()
    data = SyntheticFaces(num_classes=4, image_size=32, seed=0)
    tr = Trainer(cfg, steps_per_epoch=100)
    batches = list(data.batches(16, 4, seed=9))
    for imgs, labels in batches[:2]:
        tr.train_step(imgs, labels)

    ck = Checkpointer(str(tmp_path / "ckpt"), keep=2, async_save=False)
    step = int(jax.device_get(tr.state["step"]))
    ck.save(step, tr.state, cfg.to_json())
    ck.wait()

    # fresh trainer, restore, next-step loss must match bitwise
    tr2 = Trainer(cfg, steps_per_epoch=100)
    tr2.state = ck.restore(tr2.state)
    assert int(jax.device_get(tr2.state["step"])) == step

    m1 = tr.train_step(*batches[2])
    m2 = tr2.train_step(*batches[2])
    l1 = float(jax.device_get(m1["loss"]))
    l2 = float(jax.device_get(m2["loss"]))
    assert l1 == l2, (l1, l2)

    cfg_back = ck.restore_config()
    assert cfg_back is not None and cfg_back["name"] == "tiny-test"
    ck.close()


def test_streaming_ce_impl_in_trainer():
    """loss.ce_impl=streaming trains and matches the dense first-step loss."""
    data = SyntheticFaces(num_classes=6, image_size=32, seed=2)
    imgs, labels = next(data.batches(16, 1, seed=4))
    losses = {}
    for impl in ("dense", "streaming"):
        cfg = _tiny_cfg(num_classes=6)
        cfg = cfg.override(**{"loss.ce_impl": impl, "loss.ce_block": 4})
        tr = Trainer(cfg, steps_per_epoch=100)
        assert tr._ce_impl == impl
        m = tr.train_step(imgs, labels)
        losses[impl] = float(jax.device_get(m["loss"]))
    assert abs(losses["dense"] - losses["streaming"]) < 1e-3, losses


def test_fit_eval_hook(trained):
    """In-training eval hook fires every eval_every_steps and merges into
    the returned metrics."""
    cfg, data, _, _ = trained
    cfg2 = cfg.override(**{"train.eval_every_steps": 2,
                           "train.log_every": 100})
    tr = Trainer(cfg2, steps_per_epoch=100)
    calls = []

    def eval_fn(trainer):
        calls.append(int(jax.device_get(trainer.state["step"])))
        return {"probe": 1.0}

    last = tr.fit(data.batches(16, 5, seed=11), max_steps=5, eval_fn=eval_fn)
    assert calls == [2, 4]
    assert last.get("probe") == 1.0


def test_mesh_default_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_remat_step_matches_plain():
    """model.remat=True (jax.checkpoint on each residual block) must be a
    pure memory/FLOPs tradeoff: one train step produces the same loss and
    the same updated params as the plain backbone, to float tolerance."""
    data = SyntheticFaces(num_classes=4, image_size=32, seed=0)
    imgs, labels = data.sample(np.random.default_rng(3), 16)

    results = []
    for remat in (False, True):
        cfg = _tiny_cfg()
        cfg = cfg.override(**{"model.remat": remat})
        tr = Trainer(cfg, steps_per_epoch=100)
        m = tr.train_step(imgs, labels)
        loss = float(jax.device_get(m["loss"]))
        p = jax.tree_util.tree_leaves(tr.state["params"])
        results.append((loss, [np.asarray(x) for x in p]))

    (l0, p0), (l1, p1) = results
    assert abs(l0 - l1) < 1e-5 * max(1.0, abs(l0)), (l0, l1)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
