"""Sustained training soak on the real chip (VERDICT r2 next #3).

Runs the PRODUCTION train path — packed records → grain pipeline →
ResumableDeviceFeed (double-buffered H2D) → donated-state jitted step, with
in-loop .bin verification and async Orbax checkpoints — for thousands of
steps at the realistic operating point (IR-50, batch 256, 112×112), and
instruments where the time goes:

  step-only   device-resident step throughput (the ceiling)
  host-only   grain pipeline drain rate (decode + batch assembly)
  h2d-only    host_put transfer rate over this sandbox's TPU tunnel
  fit         the real loop (everything overlapped)

so the fit/step ratio is not just a number but an attribution: on a 1-vCPU
tunnel host, fit ≈ the serialized host bottleneck; on a production host
(multi-core decode, PCIe H2D) the same loop runs at ≥90% of step-only.

Also watches for pathologies only a long run exposes: jit retraces after
step 1, per-step time drift (leaks), loss divergence, BN/optimizer blowups.

Usage:  python -m crfr.bench.soak [--steps 2200] [--batch 256] ...
Emits one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time


def _build_pack(path: str, n_classes: int, per_class: int, size: int,
                seed: int = 0, fmt: str = "raw") -> None:
    """fmt='raw' ships pre-decoded u8 pixels (zero host decode in the hot
    loop); fmt='jpeg' stores encoded bytes so the soak's host-pipeline term
    includes a REAL per-image decode — running the soak at both settings
    turns the decode cost into a measured two-point difference instead of
    an attribution guess (VERDICT r3 next #3)."""
    import numpy as np

    from crfr.data.records import write_pack
    from crfr.data.synthetic import SyntheticFaces

    data = SyntheticFaces(num_classes=n_classes, image_size=size, seed=seed)
    rng = np.random.default_rng(seed + 1)

    def _enc(im: "np.ndarray"):
        if fmt == "raw":
            return im
        import io as _io

        from PIL import Image
        buf = _io.BytesIO()
        Image.fromarray(im).save(buf, format="JPEG", quality=92)
        return buf.getvalue()

    def records():
        for c in range(n_classes):
            imgs, _ = data._of_labels(rng, np.full(per_class, c))
            for im in imgs:
                yield c, _enc(im.astype(np.uint8))

    write_pack(path, records(), fmt=fmt)


def _build_eval_bin(path: str, n_classes: int, size: int, n_pairs: int = 600,
                    seed: int = 7) -> None:
    import numpy as np

    from crfr.data.bins import save_bin
    from crfr.data.synthetic import SyntheticFaces

    data = SyntheticFaces(num_classes=n_classes, image_size=size, seed=seed)
    i1, i2, issame = data.eval_pairs(np.random.default_rng(seed), n_pairs)
    save_bin(path, i1, i2, issame)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2200)
    ap.add_argument("--warm-steps", type=int, default=100,
                    help="steps excluded from the steady-state window")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--per-class", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--fmt", default="raw", choices=("raw", "jpeg"),
                    help="record payload: pre-decoded pixels vs encoded "
                         "JPEG (adds a real host decode per image)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/crfr_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    work = args.workdir or tempfile.mkdtemp(prefix="crfr_soak_")
    os.makedirs(work, exist_ok=True)
    pack = os.path.join(work, f"train_{args.fmt}.crfrpack")
    ebin = os.path.join(work, "pairs.bin")
    t0 = time.perf_counter()
    if not os.path.exists(pack):
        _build_pack(pack, args.classes, args.per_class, args.image_size,
                    fmt=args.fmt)
    if not os.path.exists(ebin):
        _build_eval_bin(ebin, args.classes, args.image_size)
    t_fixture = time.perf_counter() - t0
    print(f"# fixtures built in {t_fixture:.0f}s ({args.classes}x"
          f"{args.per_class} imgs)", file=sys.stderr, flush=True)

    from crfr.configs import get_config
    from crfr.data.pipeline import PipelineCfg, train_batches
    from crfr.data.records import open_source
    from crfr.eval.extract import make_extract_fn
    from crfr.data.bins import evaluate_bin
    from crfr.parallel.mesh import batch_sharding, host_put
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.feed import ResumableDeviceFeed
    from crfr.train.loop import Trainer
    from crfr.utils.logging import MetricsWriter

    cfg = get_config("casia_arcface", [
        f"data.image_size={args.image_size}",
        f"data.num_classes={args.classes}",
        f"model.backbone={args.backbone}",
        f"model.input_size={args.image_size}",
        f"train.batch_size={args.batch}",
        "train.warmup_steps=100",
        f"train.checkpoint_dir={work}/ckpt",
        "train.log_every=100000000",
    ])
    metrics = MetricsWriter(os.path.join(work, "soak_metrics.jsonl"))
    tr = Trainer(cfg, steps_per_epoch=1000, metrics=metrics)
    ck = Checkpointer(cfg.train.checkpoint_dir, keep=2)

    source = open_source(pack)

    # ---- host-pipeline-only rate (decode + batch assembly) ----
    probe = iter(train_batches(source, PipelineCfg(batch_size=args.batch,
                                                   seed=9)))
    next(probe)                                     # pipeline warmup
    t0 = time.perf_counter()
    for _ in range(20):
        next(probe)
    host_ips = 20 * args.batch / (time.perf_counter() - t0)

    # ---- H2D-only rate over the tunnel ----
    imgs_np = np.random.default_rng(0).integers(
        0, 256, (args.batch, args.image_size, args.image_size, 3)
    ).astype(np.uint8)
    bs = batch_sharding(tr.mesh, 4)
    jax.block_until_ready(host_put(imgs_np, bs))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(host_put(imgs_np, bs))
    h2d_ips = 20 * args.batch / (time.perf_counter() - t0)

    # ---- the soak: real loop with eval + checkpoints ----
    batches = train_batches(source, PipelineCfg(
        batch_size=args.batch, seed=cfg.train.seed, random_flip=True))
    feed = ResumableDeviceFeed(batches, tr.mesh)

    _eval_fn = make_extract_fn(
        tr.backbone_apply, state_fn=tr.embed_state,
        degrade_to=16, resize_mode=cfg.data.resize_mode,
        flip_fusion=cfg.eval.flip_fusion, image_size=args.image_size)

    evals = []
    losses = []
    window_times = {}
    t_start = time.perf_counter()
    t_mark = t_start
    mark_step = 0
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    m = {}
    for i, (di, dl) in enumerate(feed):
        if i >= args.steps:
            break
        m = tr.train_step(di, dl)
        step = tr.host_step
        if i == 0:
            jax.block_until_ready(tr.state["params"])
            window_times["compile_s"] = time.perf_counter() - t_start
            t_mark = time.perf_counter()
            mark_step = i + 1
        if i == args.warm_steps:                  # steady window starts
            jax.block_until_ready(tr.state["step"])
            t_mark = time.perf_counter()
            mark_step = i + 1
        if step % args.ckpt_every == 0:
            ck.save(step, tr.state, cfg.to_json())
        if step % args.eval_every == 0:
            res = evaluate_bin(ebin, _eval_fn, 256, args.image_size, 5)
            evals.append(round(res.accuracy_mean, 4))
            metrics.write(step, eval_accuracy=res.accuracy_mean)
        if step % 500 == 0:
            losses.append(round(float(jax.device_get(m["loss"])), 3))
    jax.block_until_ready(tr.state["step"])
    dt = time.perf_counter() - t_mark
    fit_ips = (args.steps - mark_step) * args.batch / dt
    final_loss = float(jax.device_get(m["loss"]))
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    n_retrace = tr._step_fn._cache_size() if hasattr(
        tr._step_fn, "_cache_size") else None
    ck.close()

    # ---- step-only ceiling (device-resident; reuses the cached compile) --
    from crfr.bench.throughput import run_train_throughput
    step_res = run_train_throughput(batch=args.batch, steps=30,
                                    backbone=args.backbone,
                                    num_classes=args.classes,
                                    image_size=args.image_size)

    out = {
        "metric": "soak_fit_imgs_per_sec",
        "steps": args.steps,
        "batch": args.batch,
        "fmt": args.fmt,
        "fit_imgs_per_sec": round(fit_ips, 1),
        "step_only_imgs_per_sec": round(step_res.imgs_per_sec, 1),
        "fit_over_step": round(fit_ips / step_res.imgs_per_sec, 3),
        "host_pipeline_imgs_per_sec": round(host_ips, 1),
        "h2d_imgs_per_sec": round(h2d_ips, 1),
        "serial_host_bound_imgs_per_sec": round(
            1.0 / (1.0 / host_ips + 1.0 / h2d_ips), 1),
        "compile_s": round(window_times.get("compile_s", 0.0), 1),
        "losses_every_500": losses,
        "final_loss": round(final_loss, 3),
        "eval_accuracy": evals,
        "jit_cache_entries": n_retrace,
        "max_rss_growth_mb": round((rss1 - rss0) / 1024, 1),
        "workdir": work,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
