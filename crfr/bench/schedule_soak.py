"""Multi-epoch schedule-realism soak on the real chip (VERDICT r3 next #5).

The plain soak (crfr/bench/soak.py) proves loop numerics/stability but its
synthetic set is linearly separable — loss saturates long before the LR
schedule matters. This harness exercises the schedule machinery on a task
that does NOT saturate:

  - ≥50k images packed from the HARD renderer (crfr/data/render.py:
    identity in geometry + fine texture; pose/illumination/background/
    noise nuisances per sample), raw-fmt records so the 1-vCPU host decode
    doesn't throttle the measurement,
  - ≥3 epochs through the production path (``python -m crfr train``:
    grain pipeline → ResumableDeviceFeed → donated jitted step), with
    linear LR warmup and TWO step-drops whose boundaries cross epoch
    boundaries (reference convention, SURVEY.md §2.1 training-loop
    hyperparameters),
  - mid-schedule kill/resume via ``--recycle-every-steps`` (checkpoint →
    exec a fresh process → bitwise resume; the metrics JSONL appends
    across generations into one continuous stream),
  - in-loop .bin verification on HELD-OUT identities every half epoch
    (eval runs with BN running stats — the trajectory is the drift watch),
  - post-hoc analysis: LR trajectory (warmup + drop factors verified from
    the log), windowed loss response around each drop, eval-accuracy
    trajectory, BN running-stat relative deltas between consecutive kept
    checkpoints (drift → 0 as stats converge), metrics-stream continuity
    across the recycle boundaries.

Usage:  python -m crfr.bench.schedule_soak [--workdir D] [--smoke]
Emits one JSON summary line on stdout; the run is resumable (fixtures and
the training run itself are cached/checkpointed under --workdir).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


# ---------------------------------------------------------------------------
# Fixtures: hard-renderer pack + held-out-identity eval pairs
# ---------------------------------------------------------------------------

def build_fixtures(workdir: str, *, ids: int, train_ids: int, per_id: int,
                   image_size: int, n_pairs: int, seed: int = 0,
                   hard: float = 1.0) -> tuple[str, str]:
    """Render (cached) the packed train set and the eval ``.bin``.

    Train records cover identities [0, train_ids) — ``per_id`` nuisance
    draws each, class-grouped (the grain pipeline reshuffles per epoch).
    Eval pairs come from the HELD-OUT range [train_ids, ids): verification
    on people the model never saw, the LFW-protocol analog."""
    import numpy as np

    from crfr.data.bins import save_bin
    from crfr.data.records import write_pack
    from crfr.data.render import RenderedIdentities

    os.makedirs(workdir, exist_ok=True)
    # hardness is baked into the rendered pixels → into the cache key
    tag = f"_h{hard:g}" if hard else ""
    pack = os.path.join(workdir, f"train_hard{tag}.crfrpack")
    ebin = os.path.join(workdir, f"pairs_heldout{tag}.bin")
    faces = None
    if not os.path.exists(pack):
        faces = RenderedIdentities(ids, image_size, seed=seed, hard=hard)
        rng = np.random.default_rng(seed + 1)

        def records():
            for c in range(train_ids):
                for im in faces.sample_for_ids(rng, np.full(per_id, c)):
                    yield c, im.astype(np.uint8)

        t0 = time.perf_counter()
        # write-then-rename: a killed build must not leave a truncated
        # pack at the cached path
        write_pack(pack + ".tmp", records(), fmt="raw")
        os.replace(pack + ".tmp", pack)
        print(f"# pack: {train_ids}x{per_id} hard renders in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
    if not os.path.exists(ebin):
        faces = faces or RenderedIdentities(ids, image_size, seed=seed,
                                            hard=hard)
        i1, i2, issame = faces.eval_pairs(
            np.random.default_rng(seed + 2), n_pairs,
            id_range=(train_ids, ids))
        save_bin(ebin, i1.astype(np.uint8), i2.astype(np.uint8), issame)
    return pack, ebin


# ---------------------------------------------------------------------------
# The run: the production CLI trainer, killed and resumed mid-schedule
# ---------------------------------------------------------------------------

def run_training(workdir: str, pack: str, ebin: str, *, backbone: str,
                 image_size: int, num_classes: int, batch: int,
                 steps_per_epoch: int, epochs: int, lr: float,
                 warmup_steps: int, drop_epochs: tuple[int, ...],
                 recycle_every: int, eval_every: int, ckpt_every: int,
                 keep: int, seed: int = 0, log_every: int = 25) -> int:
    """Drive ``python -m crfr train`` (the production entry point) as a
    subprocess. --recycle-every-steps makes the process checkpoint and
    os.execv a fresh generation mid-run — the kill/resume requirement —
    while metrics.jsonl stays one continuous stream."""
    ckdir = os.path.join(workdir, "ckpt")
    max_steps = epochs * steps_per_epoch
    cmd = [
        sys.executable, "-m", "crfr", "train",
        "--preset", "casia_arcface",
        "--max-steps", str(max_steps),
        "--steps-per-epoch", str(steps_per_epoch),
        "--eval-bin", ebin,
        "--resume",                      # idempotent: fresh dir → step 0
        f"data.train_records={pack}",
        f"data.image_size={image_size}",
        f"data.num_classes={num_classes}",
        f"model.backbone={backbone}",
        f"model.input_size={image_size}",
        f"train.batch_size={batch}",
        f"train.lr={lr}",
        "train.schedule=step",
        f"train.warmup_steps={warmup_steps}",
        f"train.lr_drop_epochs={list(drop_epochs)}",
        f"train.epochs={epochs}",
        f"train.checkpoint_dir={ckdir}",
        f"train.eval_every_steps={eval_every}",
        f"train.checkpoint_every_steps={ckpt_every}",
        f"train.keep_checkpoints={keep}",
        f"train.log_every={log_every}",
        f"train.seed={seed}",
    ]
    if recycle_every:
        cmd += ["--recycle-every-steps", str(recycle_every)]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfr_tpu_cache")
    t0 = time.perf_counter()
    rc = subprocess.run(cmd, env=env).returncode
    print(f"# training rc={rc} in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    return rc


# ---------------------------------------------------------------------------
# Post-hoc analysis of the metrics stream + checkpoints
# ---------------------------------------------------------------------------

def _read_jsonl(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _window_mean(rows: list[tuple[int, float]], lo: int, hi: int
                 ) -> float | None:
    vals = [v for s, v in rows if lo <= s < hi]
    return sum(vals) / len(vals) if vals else None


def bn_drift(ckdir: str) -> list[dict]:
    """Relative L2 delta of BN running stats between consecutive kept
    checkpoints — the eval-mode drift watch. Restores raw numpy trees
    (no template needed; analysis is offline)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckdir):
        return []
    mgr = ocp.CheckpointManager(os.path.abspath(ckdir))
    steps = sorted(mgr.all_steps())
    out = []
    prev = prev_step = None
    for s in steps:
        restored = mgr.restore(
            s, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        bs = restored["state"]["batch_stats"]
        leaves = [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(bs)]
        flat = np.concatenate(leaves) if leaves else np.zeros(1)
        if prev is not None:
            num = float(np.linalg.norm(flat - prev))
            den = float(np.linalg.norm(prev)) or 1.0
            out.append({"from_step": prev_step, "to_step": s,
                        "rel_l2": round(num / den, 5)})
        prev, prev_step = flat, s
    mgr.close()
    return out


def analyze(workdir: str, *, steps_per_epoch: int, epochs: int, lr: float,
            warmup_steps: int, drop_epochs: tuple[int, ...],
            drop_factor: float = 0.1, window: int = 50) -> dict:
    ckdir = os.path.join(workdir, "ckpt")
    rows = _read_jsonl(os.path.join(ckdir, "metrics.jsonl"))
    loss = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    lrs = [(r["step"], r["lr"]) for r in rows if "lr" in r]
    evals = [(r["step"], r["eval_accuracy"]) for r in rows
             if "eval_accuracy" in r]
    recycles = _read_jsonl(os.path.join(ckdir, "recycles.jsonl"))
    max_steps = epochs * steps_per_epoch

    # -- continuity: one monotone stream, no gap wider than the log cadence
    steps = [s for s, _ in loss]
    gaps = [(a, b) for a, b in zip(steps, steps[1:]) if not a < b <= a + 100]
    # -- warmup: earliest logged lr strictly below peak; peak == cfg lr
    # (logged lr is float32 off the device schedule → relative tolerance)
    def _near(a, b):
        return abs(a - b) <= 1e-5 * max(abs(a), abs(b))

    warm_ok = bool(lrs) and lrs[0][1] < lr * 0.999 and any(
        _near(v, lr) for s, v in lrs if s <= warmup_steps + 100)
    # -- drops: logged lr after each boundary == lr * factor^k
    drop_checks = []
    for k, e in enumerate(drop_epochs, start=1):
        boundary = e * steps_per_epoch
        want = lr * (drop_factor ** k)
        got = next((v for s, v in lrs if s >= boundary), None)
        before = _window_mean(loss, boundary - window, boundary)
        after = _window_mean(loss, boundary, boundary + window)
        drop_checks.append({
            "epoch": e, "step": boundary, "lr_want": want, "lr_got": got,
            "lr_ok": got is not None and _near(got, want),
            "loss_before": None if before is None else round(before, 4),
            "loss_after": None if after is None else round(after, 4),
        })
    return {
        "steps_logged": len(loss),
        "final_step": steps[-1] if steps else 0,
        "expected_final_step": max_steps,
        "continuity_gaps": gaps,
        "warmup_ok": warm_ok,
        "drops": drop_checks,
        "loss_per_epoch": [
            {"epoch": e + 1,
             "mean_loss": round(_window_mean(
                 loss, e * steps_per_epoch, (e + 1) * steps_per_epoch)
                 or float("nan"), 4)}
            for e in range(epochs)],
        "eval_trajectory": [{"step": s, "acc": round(v, 4)}
                            for s, v in evals],
        "recycles": [{"step": r.get("step"), "gen": r.get("gen"),
                      "max_rss_mb": r.get("max_rss_mb")} for r in recycles],
        "bn_drift": bn_drift(ckdir),
    }


# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/crfr_schedule_soak")
    ap.add_argument("--ids", type=int, default=500)
    ap.add_argument("--train-ids", type=int, default=450)
    ap.add_argument("--per-id", type=int, default=112)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--warmup-steps", type=int, default=150)
    ap.add_argument("--drop-epochs", default="3,4")
    ap.add_argument("--recycle-every", type=int, default=450)
    ap.add_argument("--n-pairs", type=int, default=500)
    ap.add_argument("--hard", type=float, default=1.0,
                    help="renderer HR-nuisance intensity (occlusion/blur/"
                         "JPEG/pose; 0 = the pre-r5 easy HR regime where "
                         "held-out eval saturates at 0.999)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny everything (CI scale): proves the harness, "
                         "not the schedule")
    args = ap.parse_args(argv)
    if args.smoke:
        args.ids, args.train_ids, args.per_id = 24, 16, 24
        args.image_size, args.backbone, args.batch = 64, "ir_18", 32
        args.epochs, args.warmup_steps = 4, 8
        args.drop_epochs, args.recycle_every = "2,3", 20
        args.n_pairs = 32

    drops = tuple(int(x) for x in args.drop_epochs.split(",") if x)
    n_train = args.train_ids * args.per_id
    spe = n_train // args.batch
    eval_every = max(spe // 2, 1)
    ckpt_every = max(spe // 2, 1)
    keep = 2 * args.epochs + 2

    if not args.analyze_only:
        pack, ebin = build_fixtures(
            args.workdir, ids=args.ids, train_ids=args.train_ids,
            per_id=args.per_id, image_size=args.image_size,
            n_pairs=args.n_pairs, seed=args.seed, hard=args.hard)
        rc = run_training(
            args.workdir, pack, ebin, backbone=args.backbone,
            image_size=args.image_size, num_classes=args.train_ids,
            batch=args.batch, steps_per_epoch=spe, epochs=args.epochs,
            lr=args.lr, warmup_steps=args.warmup_steps, drop_epochs=drops,
            recycle_every=args.recycle_every, eval_every=eval_every,
            ckpt_every=ckpt_every, keep=keep, seed=args.seed,
            log_every=1 if args.smoke else 25)
        if rc != 0:
            print(json.dumps({"error": f"training rc={rc}"}))
            return rc

    out = {"metric": "schedule_realism",
           "n_train_imgs": n_train, "steps_per_epoch": spe,
           "epochs": args.epochs, "batch": args.batch,
           "backbone": args.backbone, "warmup_steps": args.warmup_steps,
           "drop_epochs": list(drops), "hard": args.hard,
           **analyze(args.workdir, steps_per_epoch=spe, epochs=args.epochs,
                     lr=args.lr, warmup_steps=args.warmup_steps,
                     drop_epochs=drops)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
