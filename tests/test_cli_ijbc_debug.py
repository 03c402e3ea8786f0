"""eval-ijbc + import-torch CLI paths and debug utilities."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_debug_mode_nan_trap():
    from crfr.utils.debug import debug_mode

    @jax.jit
    def f(x):
        return jnp.log(x)

    with debug_mode(nans=True):
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(f(jnp.asarray(-1.0)))
    # restored afterwards: no raise
    assert np.isnan(np.asarray(f(jnp.asarray(-1.0))))


def test_no_host_transfers():
    from crfr.utils.debug import no_host_transfers

    x = jnp.ones(4)
    with no_host_transfers():
        y = x + 1                   # on-device compute fine
        if jax.devices()[0].platform != "cpu":
            # on CPU the array IS host memory (zero-copy) — nothing to trap
            with pytest.raises(Exception):
                np.asarray(y)
    np.asarray(y)                   # allowed again outside


def test_pallas_interpret_ctx(rng):
    from crfr.ops.fused_pallas import fused_degrade_normalize
    from crfr.utils.debug import pallas_interpret

    x = jnp.asarray(rng.integers(0, 256, (1, 112, 112, 3)), jnp.float32)
    with pallas_interpret():
        out = fused_degrade_normalize(x, 16, "pil", out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


def test_cli_import_torch_roundtrip(tmp_path, capsys):
    """face.evoLVe torch ckpt → import-torch CLI → eval-ready Orbax ckpt."""
    import torch

    from crfr.cli import main
    from crfr.models.irse import IRBackbone
    from crfr.train.torch_import import export_face_evolve_state_dict
    from flax import nnx

    src_model = IRBackbone(depth="18", dtype=jnp.float32, rngs=nnx.Rngs(5))
    sd = {k: torch.from_numpy(v.copy())
          for k, v in export_face_evolve_state_dict(src_model).items()}
    tp = str(tmp_path / "backbone.pth")
    torch.save(sd, tp)

    out_dir = str(tmp_path / "orbax")
    rc = main(["import-torch", "--torch-ckpt", tp, "--out", out_dir,
               "--preset", "casia_arcface",
               "mesh.data=1", "model.backbone=ir_18",
               "model.compute_dtype=float32", "model.dropout=0.0"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["out"] == out_dir

    # restore and check the imported weights really landed
    from crfr.configs import get_config
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer

    cfg = get_config("casia_arcface", ["mesh.data=1", "model.backbone=ir_18",
                                       "model.compute_dtype=float32",
                                       "model.dropout=0.0"])
    tr = Trainer(cfg, steps_per_epoch=10)
    tr.state = Checkpointer(out_dir, keep=1).restore(tr.state)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 112, 112, 3)),
                    jnp.float32)
    got = np.asarray(tr.model.backbone(x, train=False))
    want = np.asarray(src_model(x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cli_eval_ijbc(tmp_path, cli_ckpt, capsys):
    """Tiny synthetic IJB-C metadata through the CLI (session-shared
    ckpt — the subject here is the eval path, not training)."""
    from PIL import Image

    from crfr.cli import main

    rng = np.random.default_rng(0)
    ckpt, _ = cli_ckpt
    capsys.readouterr()

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    meta_lines = []
    # 4 subjects × 2 templates × 2 images
    tid = 0
    for s in range(4):
        for _ in range(2):
            for i in range(2):
                p = img_dir / f"t{tid}_{i}.jpg"
                Image.fromarray(rng.integers(0, 256, (32, 32, 3)
                                             ).astype(np.uint8)).save(p)
                meta_lines.append(f"{p} {tid} {tid * 10 + i} {s}")
            tid += 1
    (tmp_path / "meta.txt").write_text("\n".join(meta_lines))
    pair_lines = ["0 1 1", "2 3 1", "0 2 0", "1 7 0", "4 5 1", "3 6 0"]
    (tmp_path / "pairs.txt").write_text("\n".join(pair_lines))

    rc = main(["eval-ijbc", "--ckpt", ckpt,
               "--meta", str(tmp_path / "meta.txt"),
               "--pairs", str(tmp_path / "pairs.txt")])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "tar_at_far" in res and len(res["tar_at_far"]) == 6
