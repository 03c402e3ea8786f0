"""--recycle-every-steps: checkpoint → exec a fresh process → exact resume.

The supported form of the RSS-leak workaround (BASELINE.md documents ~9 MB
retained host RSS per device_put on the axon tunnel's PJRT client; r3
VERDICT weak #3 asked for a mechanism instead of an operator note).

Fast tier: _recycle_exec builds the right re-exec argv and appends the
generation record (os.execv stubbed). Slow tier: a REAL subprocess chain —
one ``crfr train`` invocation that execs itself twice and finishes with a
continuous metrics stream and the exact final step.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _overrides(tmp_path, ckpt_name="ckpt"):
    return [
        "mesh.data=1", "data.image_size=32", "data.num_classes=4",
        "data.degrade_min=16", "data.degrade_max=32",
        "model.backbone=ir_18", "model.compute_dtype=float32",
        "model.dropout=0.0", "model.input_size=32",
        "train.batch_size=8", "train.warmup_steps=2", "train.log_every=1",
        "train.checkpoint_every_steps=100",
        f"train.checkpoint_dir={tmp_path}/{ckpt_name}",
    ]


def test_recycle_exec_argv_and_log(tmp_path, monkeypatch):
    """At the recycle boundary cmd_train checkpoints, appends the
    generation record, and execs `python -m crfr <argv> --resume`."""
    from crfr.cli import main

    captured = {}

    class _Recycled(BaseException):
        pass

    def fake_execv(exe, argv):
        captured["exe"], captured["argv"] = exe, argv
        raise _Recycled

    monkeypatch.setattr(os, "execv", fake_execv)
    monkeypatch.delenv("CRFR_RECYCLE_GEN", raising=False)
    argv = ["train", "--preset", "casia_arcface", "--max-steps", "6",
            "--recycle-every-steps", "2", *_overrides(tmp_path)]
    with pytest.raises(_Recycled):
        main(argv)

    assert captured["exe"] == sys.executable
    assert captured["argv"][:3] == [sys.executable, "-m", "crfr"]
    assert captured["argv"][3:] == argv + ["--resume"]
    assert os.environ["CRFR_RECYCLE_GEN"] == "1"

    log = os.path.join(str(tmp_path), "ckpt", "recycles.jsonl")
    recs = [json.loads(line) for line in open(log)]
    assert recs == [{"step": 2, "gen": 1, "max_rss_mb": recs[0]["max_rss_mb"]}]
    assert recs[0]["max_rss_mb"] > 0

    # the boundary checkpoint exists → the re-exec'd process resumes at 2
    from crfr.train.checkpoints import Checkpointer

    ck = Checkpointer(os.path.join(str(tmp_path), "ckpt"), keep=3)
    assert ck.latest_step() == 2
    ck.close()

    # a re-invocation with --resume already present doesn't duplicate it
    captured.clear()
    with pytest.raises(_Recycled):
        main(argv + ["--resume"])
    assert captured["argv"].count("--resume") == 1


@pytest.mark.slow
def test_recycle_subprocess_chain(tmp_path):
    """Real exec chain: 9 steps with --recycle-every-steps 3 crosses two
    process generations (recycles at 3 and 6) and ends at final_step 9
    with one continuous metrics stream."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                        " --xla_cpu_max_isa=AVX2")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/crfr_test_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env.pop("CRFR_RECYCLE_GEN", None)
    out = subprocess.run(
        [sys.executable, "-m", "crfr", "train", "--preset", "casia_arcface",
         "--max-steps", "9", "--recycle-every-steps", "3",
         *_overrides(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["final_step"] == 9

    recs = [json.loads(line)
            for line in open(tmp_path / "ckpt" / "recycles.jsonl")]
    assert [(r["step"], r["gen"]) for r in recs] == [(3, 1), (6, 2)]
    assert out.stderr.count("recycling process at step") == 2
    assert "resumed from step 3" in out.stderr
    assert "resumed from step 6" in out.stderr

    # continuous metrics stream: every step 1..9 logged exactly once
    steps = [json.loads(line)["step"]
             for line in open(tmp_path / "ckpt" / "metrics.jsonl")
             if "loss" in line]
    assert steps == list(range(1, 10))
