"""MS1M-class-count FIT run through the production path (r4 VERDICT Next #4).

``scripts/ms1m_scale.py`` measures the DEVICE-RESIDENT step at C=85,742
(90.6 ms, 6.4 GB HBM, zero retraces — BASELINE.md §ms1m-scale) but trains
on one repeated batch: memorization by design, so no optimizer-trajectory
evidence exists at the real class count. This script runs a few hundred
steps at the same C through the REAL production path — hard-renderer pack
→ grain pipeline → ResumableDeviceFeed → donated jitted step, driven by
``python -m crfr train`` — and reports:

- sustained wall step time vs the §ms1m-scale 90.63 ms device ceiling
  (this sandbox's axon-tunnel H2D is attributed separately, exactly as
  BASELINE.md §soak does: real pods feed over local PCIe, not a tunnel),
- the loss trajectory over UNIQUE data (each image seen once in a
  200-step run — any descent is optimization, not memorization),
- metrics-stream continuity (gap-free logging == zero mid-run retraces
  stalls) and the logged throughput curve.

Usage: python scripts/ms1m_fit.py [--steps 200] [--classes 85742]
                                  [--workdir /tmp/crfr_ms1m_fit]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_pack(workdir: str, *, n_imgs: int, classes: int, image_size: int,
               hard: float, seed: int) -> str:
    from crfr.data.records import write_pack
    from crfr.data.render import RenderedIdentities

    os.makedirs(workdir, exist_ok=True)
    pack = os.path.join(workdir, f"ms1m_fit_c{classes}_n{n_imgs}.crfrpack")
    if os.path.exists(pack):
        return pack
    faces = RenderedIdentities(classes, image_size, seed=seed, hard=hard)
    rng = np.random.default_rng(seed + 1)
    labels = rng.integers(0, classes, n_imgs)

    def records():
        for i, c in enumerate(labels):
            yield int(c), faces.render(int(c), rng).astype(np.uint8)
            if i % 5000 == 4999:
                print(f"# rendered {i + 1}/{n_imgs}", file=sys.stderr,
                      flush=True)

    t0 = time.perf_counter()
    # write-then-rename: a killed build must not leave a truncated pack
    # at the cached path
    write_pack(pack + ".tmp", records(), fmt="raw")
    os.replace(pack + ".tmp", pack)
    print(f"# pack: {n_imgs} hard renders over C={classes} in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
    return pack


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/crfr_ms1m_fit")
    ap.add_argument("--classes", type=int, default=85742)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--hard", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()

    ckdir = os.path.join(args.workdir, "ckpt")
    n_imgs = args.steps * args.batch
    if not args.analyze_only:
        pack = build_pack(args.workdir, n_imgs=n_imgs, classes=args.classes,
                          image_size=args.image_size, hard=args.hard,
                          seed=args.seed)
        cmd = [
            sys.executable, "-m", "crfr", "train",
            "--preset", "casia_arcface",
            "--max-steps", str(args.steps),
            "--steps-per-epoch", str(args.steps),
            f"data.train_records={pack}",
            f"data.image_size={args.image_size}",
            f"data.num_classes={args.classes}",
            "loss.ce_impl=streaming",
            f"model.backbone={args.backbone}",
            f"model.input_size={args.image_size}",
            f"train.batch_size={args.batch}",
            "train.lr=0.1", "train.warmup_steps=50",
            "train.schedule=step", "train.lr_drop_epochs=[]",
            "train.epochs=1",
            f"train.checkpoint_dir={ckdir}",
            "train.eval_every_steps=1000000000",
            "train.checkpoint_every_steps=1000000000",
            "train.keep_checkpoints=1",
            "train.log_every=10",
            f"train.seed={args.seed}",
        ]
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/crfr_tpu_cache")
        t0 = time.perf_counter()
        rc = subprocess.run(cmd, env=env).returncode
        wall = time.perf_counter() - t0
        if rc != 0:
            print(json.dumps({"error": f"training rc={rc}"}))
            return rc
        print(f"# training wall {wall:.0f}s", file=sys.stderr, flush=True)

    rows = []
    mpath = os.path.join(ckdir, "metrics.jsonl")
    with open(mpath) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    loss = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    ips = [(r["step"], r["imgs_per_sec"]) for r in rows
           if "imgs_per_sec" in r]
    steps = [s for s, _ in loss]
    gaps = [(a, b) for a, b in zip(steps, steps[1:]) if b != a + 10]
    half = len(ips) // 2
    steady_ips = float(np.median([v for _, v in ips[half:]])) if ips else 0.0
    wall_ms = 1e3 * args.batch / steady_ips if steady_ips else None

    def win(lo, hi):
        vals = [v for s, v in loss if lo <= s < hi]
        return round(float(np.mean(vals)), 3) if vals else None

    q = args.steps // 4
    out = {
        "metric": "ms1m_fit",
        "classes": args.classes, "backbone": args.backbone,
        "batch": args.batch, "steps": args.steps,
        "unique_imgs": n_imgs, "epochs_of_data": 1.0,
        "steady_imgs_per_sec": round(steady_ips, 1),
        "steady_wall_step_ms": round(wall_ms, 1) if wall_ms else None,
        # BASELINE §ms1m-scale device-resident ceiling for the same shape
        "device_step_ms_ref": 90.63,
        "feed_overhead_ms": (round(wall_ms - 90.63, 1) if wall_ms else None),
        "loss_first": loss[0][1] if loss else None,
        "loss_quarters": [win(i * q, (i + 1) * q) for i in range(4)],
        "continuity_gaps": gaps,
        "final_step": steps[-1] if steps else 0,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
