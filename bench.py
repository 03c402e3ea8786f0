#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the BASELINE north-star metric.

{"metric": "embed_imgs_per_sec_per_chip", "value": N, "unit": "imgs/sec/chip",
 "vs_baseline": N / cpu_reference_imgs_per_sec}

The metric is aligned-112×112 embedding extraction (16→112 bicubic probe
degradation + normalize + IR-50) on one TPU chip; the baseline divisor is the
measured torch-CPU reference pipeline (PIL bicubic + torch IR-50), cached
after first measurement. BASELINE target: vs_baseline ≥ 5.
"""

import json
import sys


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--skip-cpu-baseline", action="store_true")
    args = ap.parse_args()

    from crfr.bench.throughput import run_throughput

    res = run_throughput(batch=args.batch, steps=args.steps,
                         backbone=args.backbone)

    if args.skip_cpu_baseline:
        cpu_ips = None
    else:
        from crfr.bench.torch_reference import measure_cpu_reference
        cpu_ips = measure_cpu_reference(batch=32, iters=3)

    out = {
        "metric": "embed_imgs_per_sec_per_chip",
        "value": round(res.imgs_per_sec, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": (round(res.imgs_per_sec / cpu_ips, 2)
                        if cpu_ips else None),
    }
    print(json.dumps(out))
    print(f"# batch={res.batch} steps={res.steps} "
          f"compile={res.compile_seconds:.1f}s "
          f"per_batch={res.per_batch_ms:.2f}ms "
          f"cpu_ref={cpu_ips and round(cpu_ips, 1)} imgs/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
