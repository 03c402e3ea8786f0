#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the BASELINE north-star metric.

{"metric": "embed_imgs_per_sec_per_chip", "value": N, "unit": "imgs/sec/chip",
 "vs_baseline": N / cpu_reference_imgs_per_sec, ...}

The metric is aligned-112×112 embedding extraction (16→112 bicubic probe
degradation + normalize + IR-50) on one TPU chip. Steady-state throughput and
compile time are reported SEPARATELY (compile is tunnel-bound in this sandbox
— 900 s cold vs 82 s typical — and must not pollute the metric).

The baseline divisor is the torch-CPU reference pipeline (PIL bicubic + torch
IR-50). It is PINNED in BENCH_CPU_REF.json (measured on a quiet host) rather
than re-measured per run: r2's re-measurement on a contended 1-vCPU box
halved it (8.7 → 4.3 imgs/s) and inflated vs_baseline 2× — bench runs must
be comparable across rounds by construction. Re-measure explicitly with
--remeasure-cpu on a quiet host if the environment changes.
BASELINE target: vs_baseline ≥ 5.
"""

import json
import os
import sys

CPU_REF_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_CPU_REF.json")


def _cpu_reference(remeasure: bool) -> tuple[float | None, str]:
    if not remeasure and os.path.exists(CPU_REF_PATH):
        with open(CPU_REF_PATH) as f:
            ref = json.load(f)
        return float(ref["cpu_ref_imgs_per_sec"]), "pinned"
    from crfr.bench.torch_reference import measure_cpu_reference
    ips = measure_cpu_reference(batch=32, iters=3)
    if remeasure and ips:
        with open(CPU_REF_PATH, "w") as f:
            json.dump({"cpu_ref_imgs_per_sec": round(ips, 2),
                       "pipeline": "torch-CPU IR-50 + PIL 16->112 degrade",
                       "note": "re-measured via bench.py --remeasure-cpu"},
                      f, indent=2)
    return ips, "measured"


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backbone", default="ir_50")
    ap.add_argument("--skip-cpu-baseline", action="store_true")
    ap.add_argument("--skip-int8", action="store_true",
                    help="skip the auxiliary int8 PTQ measurement")
    ap.add_argument("--remeasure-cpu", action="store_true",
                    help="re-measure the torch-CPU reference (quiet host "
                         "only) and update BENCH_CPU_REF.json")
    ap.add_argument("--init-timeout", type=float, default=600.0,
                    help="seconds to wait for device/backend init before "
                         "failing cleanly (the axon tunnel can go down; a "
                         "hang here would eat the whole bench window)")
    args = ap.parse_args()

    # Persistent compile cache: repeat bench runs in one round skip the
    # (tunnel-bound) TPU compile entirely.
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/crfr_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Bounded backend probe: device enumeration blocks forever when the
    # TPU tunnel is unresponsive. Probe it on a daemon thread and emit a
    # machine-readable failure line instead of hanging the driver.
    import threading
    _ready = threading.Event()
    threading.Thread(target=lambda: (jax.devices(), _ready.set()),
                     daemon=True).start()
    if not _ready.wait(args.init_timeout):
        print(json.dumps({
            "metric": "embed_imgs_per_sec_per_chip", "value": None,
            "unit": "imgs/sec/chip", "vs_baseline": None,
            "error": (f"device init timed out after {args.init_timeout:.0f}s"
                      " — TPU backend (axon tunnel) unresponsive"),
        }))
        sys.exit(1)

    from crfr.bench.throughput import run_throughput

    res = run_throughput(batch=args.batch, steps=args.steps,
                         backbone=args.backbone)

    # Auxiliary int8 PTQ serving number (models/quant.py). The HEADLINE
    # metric stays bf16 so rounds remain comparable by construction; int8
    # is the production-serving extra (1.57× measured r3).
    int8_res = None
    if not args.skip_int8:
        try:
            int8_res = run_throughput(batch=args.batch, steps=args.steps,
                                      backbone=args.backbone, int8=True)
        except Exception as e:  # aux must never sink the headline
            print(f"# int8 aux bench failed: {e!r}", file=sys.stderr)

    if args.skip_cpu_baseline:
        cpu_ips, cpu_src = None, "skipped"
    else:
        cpu_ips, cpu_src = _cpu_reference(args.remeasure_cpu)

    out = {
        "metric": "embed_imgs_per_sec_per_chip",
        "value": round(res.imgs_per_sec, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": (round(res.imgs_per_sec / cpu_ips, 2)
                        if cpu_ips else None),
        "per_batch_ms": round(res.per_batch_ms, 2),
        "compile_seconds": round(res.compile_seconds, 1),
        "cpu_ref_imgs_per_sec": cpu_ips and round(cpu_ips, 2),
        "cpu_ref_source": cpu_src,
        "int8_imgs_per_sec": (int8_res and round(int8_res.imgs_per_sec, 1)),
        "int8_per_batch_ms": (int8_res and round(int8_res.per_batch_ms, 2)),
    }
    print(json.dumps(out))
    print(f"# batch={res.batch} steps={res.steps} "
          f"compile={res.compile_seconds:.1f}s "
          f"per_batch={res.per_batch_ms:.2f}ms "
          f"cpu_ref={cpu_ips and round(cpu_ips, 1)} imgs/s ({cpu_src})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
