"""Test env: force an 8-device virtual CPU platform BEFORE jax backends init.

This is the SURVEY.md §4 "distributed-without-a-cluster" harness: every
pjit/shard_map path (DP step, class-sharded ArcFace CE, sharded eval matmul)
runs against a real 8-way Mesh on fake CPU devices, no TPU pod needed.

NOTE: this sandbox's sitecustomize force-registers the 'axon' TPU PJRT plugin
and exports JAX_PLATFORMS=axon in every process, so plain env vars set here
are too late for the platform choice — but jax backends initialize lazily, so
``jax.config.update('jax_platforms', 'cpu')`` before any device use still
wins. XLA_FLAGS is read at (lazy) backend init, so setting it here works.

Set CRFR_TEST_TPU=1 to instead run the suite on the real attached chip(s).
"""

import os

_USE_TPU = bool(os.environ.get("CRFR_TEST_TPU"))

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Cap the CPU ISA: without this, XLA:CPU AOT cache entries embed
    # machine-detected pseudo-features (prefer-no-scatter/gather) that fail
    # the loader's host check, so the persistent cache NEVER loads and
    # every run recompiles everything (verified: 6 loader errors + full
    # recompile without the flag; clean cache hits with it). AVX2 is plenty
    # for test-sized programs; compile time dominates them anyway.
    if "xla_cpu_max_isa" not in flags:
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the suite re-compiles the same CPU-mesh
    # programs every run (every round); caching them on disk cuts suite
    # wall-time substantially from the second run on.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("CRFR_TEST_CACHE",
                                     "/tmp/crfr_test_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    if not _USE_TPU:
        assert jax.devices()[0].platform == "cpu", jax.devices()
        assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cli_ckpt(tmp_path_factory):
    """Session-shared CLI-trained checkpoint: (ckpt_dir, overrides).

    For tests whose subject is an eval/serve/distill CLI path and that just
    need *a* restorable checkpoint — NOT the training itself (suite-time:
    these used to each train their own throwaway model, paying a full
    sharded-train-step trace per test). Consumers only read the directory."""
    from crfr.cli import main

    root = tmp_path_factory.mktemp("cli_ckpt")
    ckpt = str(root / "ckpt")
    overrides = [
        "mesh.data=8",
        "data.image_size=32", "data.num_classes=4",
        "data.degrade_min=16", "data.degrade_max=32",
        "model.backbone=ir_18", "model.compute_dtype=float32",
        "model.dropout=0.0", "model.input_size=32",
        "loss.scale=16.0", "loss.margin=0.2",
        "train.batch_size=8", "train.warmup_steps=2",
        f"train.checkpoint_dir={ckpt}",
    ]
    assert main(["train", "--preset", "casia_arcface", "--max-steps", "2",
                 *overrides]) == 0
    return ckpt, overrides


@pytest.fixture(scope="session")
def trained_session():
    """(cfg, data, trainer, losses): ir_18@32 trained 30 steps on the
    4-class synthetic set — THE session-shared trained model (SURVEY §4
    tier 2). One fixture serves both test_train's learning asserts and the
    frozen teacher for the distill/SR tests (suite-time: these used to
    train three separate models). Consumers only READ the trainer state
    (teacher_from_trainer / embed_fn close over it); never train_step it."""
    from crfr.configs import (Config, DataCfg, LossCfg, MeshCfg, ModelCfg,
                              TrainCfg)
    from crfr.data.synthetic import SyntheticFaces
    from crfr.train.loop import Trainer

    cfg = Config(
        name="tiny-test",
        mesh=MeshCfg(data=8, model=1),
        data=DataCfg(image_size=32, num_classes=4, degrade_min=8,
                     degrade_max=32),
        model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                       dropout=0.0, input_size=32),
        loss=LossCfg(scale=16.0, margin=0.2),
        train=TrainCfg(batch_size=16, lr=0.05, warmup_steps=5,
                       weight_decay=5e-4, log_every=10 ** 9, seed=0),
    )
    import jax as _jax

    tr = Trainer(cfg, steps_per_epoch=100)
    data = SyntheticFaces(num_classes=4, image_size=32, seed=0)
    losses = []
    for imgs, labels in data.batches(16, 30, seed=1):
        m = tr.train_step(imgs, labels)
        losses.append(float(_jax.device_get(m["loss"])))
    return cfg, data, tr, losses


@pytest.fixture(scope="session")
def tiny_teacher(trained_session):
    """The session-shared trained Trainer (teacher role). Read-only."""
    return trained_session[2]
