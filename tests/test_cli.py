"""CLI end-to-end: train → checkpoint → resume; pack; bench args parse.
Runs in-process (cli.main) on the 8-device CPU platform."""

import json
import os

import numpy as np
import pytest

from crfr.cli import main


def _capture(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


@pytest.fixture()
def tiny_overrides(tmp_path):
    return [
        "mesh.data=8",
        "data.image_size=32", "data.num_classes=4",
        "data.degrade_min=16", "data.degrade_max=32",
        "model.backbone=ir_18", "model.compute_dtype=float32",
        "model.dropout=0.0", "model.input_size=32",
        "loss.scale=16.0", "loss.margin=0.2",
        "train.batch_size=8", "train.warmup_steps=2",
        "train.checkpoint_every_steps=2",
        f"train.checkpoint_dir={tmp_path}/ckpt",
    ]


def test_cli_train_and_resume(tmp_path, tiny_overrides, capsys):
    rc = main(["train", "--preset", "casia_arcface", "--max-steps", "4",
               *tiny_overrides])
    assert rc == 0
    res = _capture(capsys)
    assert res["final_step"] == 4
    # resume continues from the checkpoint
    rc = main(["train", "--preset", "casia_arcface", "--max-steps", "6",
               "--resume", *tiny_overrides])
    assert rc == 0
    res = _capture(capsys)
    assert res["final_step"] == 6


def test_cli_train_distill(tmp_path, cli_ckpt, capsys):
    teacher_ckpt, overrides = cli_ckpt       # session-shared teacher
    capsys.readouterr()
    rc = main(["train-distill", "--preset", "casia_arcface",
               "--teacher-ckpt", teacher_ckpt, "--max-steps", "3",
               "--kd-weight", "1.0", *overrides,
               f"train.checkpoint_dir={tmp_path}/distill"])
    assert rc == 0
    res = _capture(capsys)
    assert res["steps"] == 3 and np.isfinite(res["loss"])


def test_cli_pack_and_eval_paths(tmp_path, capsys):
    from PIL import Image

    rng = np.random.default_rng(0)
    for ident in ("a", "b"):
        d = tmp_path / "imgs" / ident
        d.mkdir(parents=True)
        for j in range(3):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                            ).save(d / f"{j}.jpg")
    out = str(tmp_path / "packed.crfrpack")
    rc = main(["pack", "--root", str(tmp_path / "imgs"), "--out", out,
               "--size", "32"])
    assert rc == 0
    res = _capture(capsys)
    assert res["images"] == 6 and res["identities"] == 2
    assert os.path.exists(out)


def test_cli_export(tmp_path, cli_ckpt, capsys):
    ckpt, overrides = cli_ckpt               # session-shared ckpt
    capsys.readouterr()
    out = str(tmp_path / "m.crfrx")
    rc = main(["export", "--ckpt", ckpt, "--out", out,
               "--batch", "4", "--degrade", "16", *overrides])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["batch"] == 4 and res["degrade_to"] == 16
    from crfr.serve import load_embed
    import jax.numpy as jnp
    fn = load_embed(out)
    emb = np.asarray(fn(jnp.zeros((4, 32, 32, 3), jnp.uint8)))
    assert emb.shape == (4, 512) and np.isfinite(emb).all()


def test_cli_unknown_override_fails(tiny_overrides):
    with pytest.raises(KeyError):
        main(["train", "--preset", "casia_arcface", "--max-steps", "1",
              "data.bogus=1"])
