"""MS1M-shape scale exercise on the real chip (r3 VERDICT Next #4).

One-chip train step at BASELINE config 5's class count: IR-50, b256,
C=85742 via the streaming (flash-softmax) CE — measures steady-state step
time, device memory in use, and retrace count. Records the row BASELINE.md
§ms1m-scale cites.

Usage: python scripts/ms1m_scale.py [--batch 256] [--classes 85742]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from crfr.configs import Config, DataCfg, LossCfg, MeshCfg, ModelCfg, TrainCfg
from crfr.train.loop import Trainer


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--classes", type=int, default=85742)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backbone", default="ir_50")
    args = ap.parse_args()

    cfg = Config(
        name="ms1m-scale",
        mesh=MeshCfg(data=1, model=1),
        data=DataCfg(image_size=112, num_classes=args.classes,
                     degrade_min=112, degrade_max=112,
                     per_sample_degrade=False),
        model=ModelCfg(backbone=args.backbone, compute_dtype="bfloat16",
                       input_size=112),
        loss=LossCfg(ce_impl="streaming"),
        train=TrainCfg(batch_size=args.batch, lr=0.1, warmup_steps=5,
                       log_every=10 ** 9, seed=0),
    )
    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, 112, 112, 3)).astype(np.uint8)
    labels = rng.integers(0, args.classes, args.batch).astype(np.int32)

    t0 = time.time()
    m = tr.train_step(imgs, labels)          # compile + step 1
    loss0 = float(jax.device_get(m["loss"]))
    compile_s = time.time() - t0

    # steady state: async dispatch, one sync at the end
    n = args.steps
    t0 = time.time()
    for _ in range(n):
        m = tr.train_step(imgs, labels)
    loss = float(jax.device_get(m["loss"]))
    dt = time.time() - t0
    step_ms = dt / n * 1000

    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {"bytes_in_use_gb": round(ms["bytes_in_use"] / 2 ** 30, 2),
               "peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
               "limit_gb": round(ms.get("bytes_limit", 0) / 2 ** 30, 2)}
    except Exception as e:                                    # noqa: BLE001
        mem = {"memory_stats": f"unavailable: {e}"}

    out = {
        "backbone": args.backbone, "batch": args.batch,
        "classes": args.classes, "ce_impl": "streaming",
        "compile_plus_first_step_s": round(compile_s, 1),
        "steady_step_ms": round(step_ms, 2),
        "imgs_per_sec": round(args.batch / (step_ms / 1000), 1),
        "loss_first": round(loss0, 3), "loss_last": round(loss, 3),
        **mem,
    }
    # expected loss at init ≈ ln(C): softmax over C classes
    out["ln_C"] = round(float(np.log(args.classes)), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
