"""Serving export roundtrip, EER, generic pairs parser, multihost helpers,
TB-optional metrics writer."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from crfr.configs import Config, DataCfg, LossCfg, MeshCfg, ModelCfg, TrainCfg
from crfr.data.synthetic import SyntheticFaces
from crfr.train.loop import Trainer


def _tiny_cfg():
    return Config(
        name="serve-test",
        mesh=MeshCfg(data=1, model=1),
        data=DataCfg(image_size=32, num_classes=4, degrade_min=16,
                     degrade_max=32),
        model=ModelCfg(backbone="ir_18", compute_dtype="float32",
                       dropout=0.0, input_size=32),
        loss=LossCfg(scale=16.0, margin=0.2),
        train=TrainCfg(batch_size=8, warmup_steps=2),
    )


def test_export_load_roundtrip(tmp_path):
    from crfr.serve import export_embed, load_embed, read_meta

    tr = Trainer(_tiny_cfg(), steps_per_epoch=10)
    p = str(tmp_path / "m.crfrx")
    meta = export_embed(tr, p, batch=4, degrade_to=16)
    assert meta["embedding_dim"] == 512 and meta["batch"] == 4

    fn = load_embed(p)
    assert read_meta(p)["backbone"] == "ir_18"
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    emb = np.asarray(fn(jnp.asarray(x)))
    assert emb.shape == (4, 512) and np.isfinite(emb).all()

    # must match the live model's output through the same pipeline
    from crfr.serve import build_serving_fn
    live = build_serving_fn(lambda y: tr.model.backbone(y, train=False),
                            degrade_to=16, image_size=32)
    want = np.asarray(live(jnp.asarray(x)))
    np.testing.assert_allclose(emb, want, atol=1e-4)


def test_export_hallucinated_pipeline(tmp_path):
    """AOT artifact with the frozen hallucinator baked in: ↓8 → G ↑ →
    backbone. At G init (bicubic skip, zero-init heads) it must equal the
    plain degrade artifact."""
    from crfr.serve import export_embed, load_embed, read_meta
    from crfr.train.sr_loop import SRTrainer

    cfg = _tiny_cfg()
    tr = Trainer(cfg, steps_per_epoch=10)
    sr_tr = SRTrainer(cfg, scale=4, n_priors=4)
    p_sr = str(tmp_path / "sr.crfrx")
    p_plain = str(tmp_path / "plain.crfrx")
    meta = export_embed(tr, p_sr, batch=4, degrade_to=8,
                        sr_apply=sr_tr.sr_apply(ema=False))
    assert meta["hallucinated"] is True
    export_embed(tr, p_plain, batch=4, degrade_to=8)
    assert read_meta(p_plain)["hallucinated"] is False

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    e_sr = np.asarray(load_embed(p_sr)(jnp.asarray(x)))
    e_plain = np.asarray(load_embed(p_plain)(jnp.asarray(x)))
    assert e_sr.shape == (4, 512) and np.isfinite(e_sr).all()
    np.testing.assert_allclose(e_sr, e_plain, atol=1e-2)


def test_export_bad_magic(tmp_path):
    from crfr.serve import load_embed

    p = tmp_path / "junk.crfrx"
    p.write_bytes(b"NOTMAGIC" + b"x" * 100)
    with pytest.raises(ValueError, match="not a crfr serving artifact"):
        load_embed(str(p))


def test_eer(rng):
    from crfr.eval.verification import compute_eer

    # perfectly separated → EER 0
    d = np.concatenate([np.zeros(50), np.ones(50)])
    s = np.concatenate([np.ones(50, bool), np.zeros(50, bool)])
    assert compute_eer(d, s) == pytest.approx(0.0, abs=0.02)
    # identical distributions → EER ~0.5
    d = rng.uniform(0, 1, 200)
    s = rng.random(200) < 0.5
    assert 0.3 < compute_eer(d, s) < 0.7


def test_eer_in_verification_result(rng):
    from crfr.eval.verification import evaluate_verification

    a = rng.normal(0, 1, (200, 32)).astype(np.float32)
    res = evaluate_verification(a, a + rng.normal(0, 0.05, a.shape).astype(np.float32),
                                np.ones(200, bool) ^ (np.arange(200) % 2 == 0),
                                n_folds=4)
    assert np.isfinite(res.eer)


def test_generic_pairs_parser(tmp_path):
    from crfr.data.datasets import parse_generic_pairs

    pf = tmp_path / "pairs.txt"
    pf.write_text("a.jpg b.jpg 1\nc.jpg d.jpg 0\ne.jpg f.jpg true\n")
    proto = parse_generic_pairs(str(pf), "/r")
    assert proto.path1 == ["/r/a.jpg", "/r/c.jpg", "/r/e.jpg"]
    np.testing.assert_array_equal(proto.issame, [True, False, True])


def test_local_snapshot_embed_matches_live(rng):
    """parallel.mesh.local_snapshot (the multi-host redundant-eval state
    convention): snapshot-state embeddings == live-state embeddings on a
    single host; sharded/PRNG leaves survive the round trip."""
    import jax

    from crfr.eval.extract import make_extract_fn
    from crfr.parallel.mesh import local_snapshot

    cfg = _tiny_cfg().override(**{"mesh.data": 8, "mesh.model": 1})
    tr = Trainer(cfg, steps_per_epoch=10)
    data = SyntheticFaces(num_classes=4, image_size=32, seed=0)
    imgs, labels = data.sample(np.random.default_rng(1), 8)
    tr.train_step(imgs, labels)            # move BN stats off init

    snap_fn = make_extract_fn(tr.backbone_apply,
                              state_fn=lambda: local_snapshot(tr.embed_state()),
                              image_size=32, flip=False)
    live_fn = make_extract_fn(tr.backbone_apply, state_fn=tr.embed_state,
                              image_size=32, flip=False)
    x = rng.integers(0, 256, (8, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(snap_fn(x)), np.asarray(live_fn(x)),
                               rtol=2e-4, atol=2e-4)


def test_process_shard_single_host():
    from crfr.parallel.multihost import (maybe_initialize_distributed,
                                         process_shard)

    assert maybe_initialize_distributed() is False     # no env set
    start, stop = process_shard(100)
    assert (start, stop) == (0, 100)


def test_metrics_writer_jsonl(tmp_path):
    from crfr.utils.logging import MetricsWriter

    p = str(tmp_path / "m.jsonl")
    with MetricsWriter(p, stdout=False) as w:
        w.write(1, loss=2.5, tag="x")
        w.write(2, loss=1.5)
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["loss"] == 2.5 and lines[0]["tag"] == "x"
    assert lines[1]["step"] == 2


def test_metrics_tensorboard_sink(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from crfr.utils.logging import MetricsWriter

    tb = str(tmp_path / "tb")
    with MetricsWriter(str(tmp_path / "m.jsonl"), stdout=False,
                       tensorboard_dir=tb) as mw:
        mw.write(1, loss=2.5, lr=0.1)
        mw.write(2, loss=2.0, lr=0.1)
    files = [f for f in os.listdir(tb) if "tfevents" in f]
    assert files, os.listdir(tb)
    # scalars round-trip through the event file
    total = 0
    from tensorflow.python.summary.summary_iterator import summary_iterator
    for ev in summary_iterator(os.path.join(tb, files[0])):
        for v in ev.summary.value:
            if v.tag in ("loss", "lr"):
                total += 1
    assert total >= 4, total


def test_host_put_matches_device_put_single_process():
    """host_put is bit-identical to device_put in single-process mode (the
    multi-process branch is exercised for real in tests/test_multihost.py)."""
    import jax
    from crfr.parallel.mesh import batch_sharding, host_put, make_mesh, replicated

    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    a = host_put(x, batch_sharding(mesh, 2))
    b = jax.device_put(x, batch_sharding(mesh, 2))
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    r = host_put(np.float32(3.0), replicated(mesh))
    assert float(r) == 3.0
