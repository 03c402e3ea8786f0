"""MS1M-shape scale exercise on the real chip (r3 VERDICT Next #4).

One-chip train step at BASELINE config 5's class count (C=85742, IR-50,
b256, streaming flash-softmax CE), measured DEVICE-RESIDENT — donated
state, inputs already on chip — so the number is the step itself, not this
sandbox's tunnel H2D (which adds ~184 ms/b256 and ~41 ms round-trip latency
per fetch; see BASELINE.md §soak for the feed attribution). A small-C
control run isolates the head's marginal cost. Also reports the compiled
program's own HBM accounting (axon's PJRT client exposes no
device memory_stats) and the retrace count.

Records the row BASELINE.md §ms1m-scale cites.

Usage: python scripts/ms1m_scale.py [--batch 256] [--classes 85742]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def _measure(batch: int, classes: int, backbone: str, steps: int) -> dict:
    from crfr.bench.throughput import run_train_throughput

    r = run_train_throughput(batch=batch, steps=steps, backbone=backbone,
                             num_classes=classes)
    return {"classes": classes,
            "steady_step_ms": round(r.per_batch_ms, 2),
            "imgs_per_sec": round(r.imgs_per_sec, 1),
            "compile_s": round(r.compile_seconds, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--classes", type=int, default=85742)
    ap.add_argument("--control-classes", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backbone", default="ir_50")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/crfr_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    big = _measure(args.batch, args.classes, args.backbone, args.steps)
    ctrl = _measure(args.batch, args.control_classes, args.backbone,
                    args.steps)

    # loss sanity + HBM accounting on a fresh trainer at the big C
    from crfr.configs import Config, DataCfg, LossCfg, ModelCfg, TrainCfg
    from crfr.parallel.mesh import batch_sharding
    from crfr.train.loop import Trainer
    import jax.numpy as jnp

    cfg = Config(
        name="ms1m-scale",
        data=DataCfg(image_size=112, num_classes=args.classes),
        model=ModelCfg(backbone=args.backbone, input_size=112),
        loss=LossCfg(ce_impl="streaming"),
        train=TrainCfg(batch_size=args.batch, lr=0.1, warmup_steps=5,
                       log_every=10 ** 9, seed=0),
    )
    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (args.batch, 112, 112, 3)),
                    jnp.float32), batch_sharding(tr.mesh, 4))
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, args.classes, args.batch), jnp.int32),
        batch_sharding(tr.mesh, 1))

    mem = {}
    try:
        comp = tr._step_fn.lower(tr.state, imgs, labels).compile()
        ma = comp.memory_analysis()
        mem = {"hbm_args_gb": round(ma.argument_size_in_bytes / 2 ** 30, 2),
               "hbm_temp_gb": round(ma.temp_size_in_bytes / 2 ** 30, 2),
               "hbm_total_gb": round(
                   (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes) / 2 ** 30, 2)}
    except Exception as e:                                    # noqa: BLE001
        mem = {"memory_analysis": f"unavailable: {e}"}

    state, m = tr._step_fn(tr.state, imgs, labels)
    loss0 = float(jax.device_get(m["loss"]))
    for _ in range(args.steps):
        state, m = tr._step_fn(state, imgs, labels)
    loss = float(jax.device_get(m["loss"]))
    retraces = (tr._step_fn._cache_size()
                if hasattr(tr._step_fn, "_cache_size") else None)

    out = {
        "backbone": args.backbone, "batch": args.batch,
        "ce_impl": "streaming(auto)",
        "ms1m": big, "control": ctrl,
        "head_marginal_ms": round(big["steady_step_ms"]
                                  - ctrl["steady_step_ms"], 2),
        "loss_first": round(loss0, 3),
        # repeated single batch => memorization; expect -> ~0
        "loss_after_steps": round(loss, 4),
        "ln_C": round(float(np.log(args.classes)), 3),
        "jit_cache_entries": retraces,
        **mem,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
