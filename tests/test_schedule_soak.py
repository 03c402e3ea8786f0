"""Multi-epoch schedule-realism soak harness (crfr/bench/schedule_soak.py,
VERDICT r3 next #5).

Fast tier: the analyzer's verdicts (warmup, drop factors, loss windows,
continuity, recycle records) on a fabricated metrics stream, and the
hard-renderer fixture builder at tiny scale. Slow tier: the REAL harness
end-to-end at --smoke scale — production ``crfr train`` subprocess chain
with warmup + two LR drops crossing epoch boundaries and mid-schedule
process recycles, then the analysis of its actual artifacts.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_analyze_verdicts(tmp_path):
    """analyze() reads the metrics stream and checks the schedule contract:
    warmup ramp, lr == lr0·factor^k after each drop, windowed loss response,
    no gaps, recycle generations surfaced."""
    from crfr.bench.schedule_soak import analyze

    # 2 epochs of 10 steps, warmup 4, drop at epoch 1 (step 10), log_every 1
    lr0, rows = 0.1, []
    for s in range(1, 21):
        lr = lr0 * s / 4 if s < 4 else (lr0 if s < 10 else lr0 * 0.1)
        loss = 10.0 - 0.2 * s - (1.0 if s >= 10 else 0.0)
        rows.append({"step": s, "loss": loss, "lr": lr})
        if s % 5 == 0:
            rows.append({"step": s, "eval_accuracy": 0.5 + 0.01 * s})
    ckdir = tmp_path / "ckpt"
    _write_jsonl(str(ckdir / "metrics.jsonl"), rows)
    _write_jsonl(str(ckdir / "recycles.jsonl"),
                 [{"step": 12, "gen": 1, "max_rss_mb": 512.0}])

    out = analyze(str(tmp_path), steps_per_epoch=10, epochs=2, lr=lr0,
                  warmup_steps=4, drop_epochs=(1,), window=5)
    assert out["final_step"] == 20 and out["expected_final_step"] == 20
    assert out["continuity_gaps"] == []
    assert out["warmup_ok"]
    (d,) = out["drops"]
    assert d["lr_ok"] and d["step"] == 10
    assert d["loss_after"] < d["loss_before"]
    assert [e["acc"] for e in out["eval_trajectory"]] == \
        pytest.approx([0.55, 0.6, 0.65, 0.7])
    assert out["recycles"] == [{"step": 12, "gen": 1, "max_rss_mb": 512.0}]
    assert out["bn_drift"] == []          # no checkpoints → empty, no raise

    # a hole in the stream is flagged
    _write_jsonl(str(ckdir / "metrics.jsonl"),
                 [r for r in rows if r["step"] not in range(8, 12)
                  or "loss" not in r])
    out2 = analyze(str(tmp_path), steps_per_epoch=10, epochs=2, lr=lr0,
                   warmup_steps=4, drop_epochs=(1,), window=5)
    assert out2["continuity_gaps"] == []  # gap of 4 < the 100-step tolerance
    # wrong lr after the drop is flagged
    bad = [dict(r, lr=lr0) if r.get("step", 0) >= 10 and "lr" in r else r
           for r in rows]
    _write_jsonl(str(ckdir / "metrics.jsonl"), bad)
    out3 = analyze(str(tmp_path), steps_per_epoch=10, epochs=2, lr=lr0,
                   warmup_steps=4, drop_epochs=(1,), window=5)
    assert not out3["drops"][0]["lr_ok"]


def test_build_fixtures_tiny(tmp_path):
    """Fixture builder: packed hard-renderer records for ids [0, train_ids)
    and eval pairs drawn ONLY from the held-out range."""
    import numpy as np

    from crfr.bench.schedule_soak import build_fixtures
    from crfr.data.bins import load_bin
    from crfr.data.records import open_source

    pack, ebin = build_fixtures(str(tmp_path), ids=6, train_ids=4, per_id=5,
                                image_size=40, n_pairs=8, seed=3)
    src = open_source(pack)
    assert len(src) == 4 * 5
    labels = {src[i][0] for i in range(len(src))}
    assert labels == set(range(4))
    lbl, img = src[0]
    assert img.shape == (40, 40, 3) and img.dtype == np.uint8

    i1, i2, issame = load_bin(ebin)
    assert len(i1) == len(i2) == len(issame) == 16
    assert issame[:8].all() and not issame[8:].any()

    # cached: a second call returns the same files without re-rendering
    t0 = os.path.getmtime(pack)
    build_fixtures(str(tmp_path), ids=6, train_ids=4, per_id=5,
                   image_size=40, n_pairs=8, seed=3)
    assert os.path.getmtime(pack) == t0


@pytest.mark.slow
def test_schedule_soak_smoke(tmp_path):
    """The real harness at --smoke scale: 4 epochs × 12 steps of ir_18@64px
    on 384 hard-rendered images through ``crfr train``, recycling every 20
    steps (two process generations), warmup 8, drops at epochs 2 and 3.
    Asserts the analysis of the run's ACTUAL artifacts."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                        " --xla_cpu_max_isa=AVX2")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/crfr_test_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env.pop("CRFR_RECYCLE_GEN", None)
    out = subprocess.run(
        [sys.executable, "-m", "crfr.bench.schedule_soak", "--smoke",
         "--workdir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])

    assert res["steps_per_epoch"] == 12 and res["epochs"] == 4
    assert res["final_step"] == res["expected_final_step"] == 48
    assert res["continuity_gaps"] == []
    assert res["warmup_ok"]
    assert [d["step"] for d in res["drops"]] == [24, 36]
    assert all(d["lr_ok"] for d in res["drops"])
    # two generations crossed (recycles at 20 and 40), stream continuous
    assert [(r["step"], r["gen"]) for r in res["recycles"]] == \
        [(20, 1), (40, 2)]
    # BN running stats were checkpointed and move less as training settles
    drift = res["bn_drift"]
    assert len(drift) >= 2 and all(d["rel_l2"] >= 0 for d in drift)
    assert drift[-1]["rel_l2"] < drift[0]["rel_l2"]
    # eval on held-out identities ran every half epoch
    assert len(res["eval_trajectory"]) >= 4
