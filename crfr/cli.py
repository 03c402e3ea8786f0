"""Command-line drivers — the rebuild's equivalents of the reference's
``train.py`` / ``eval_*.py`` entry points (SURVEY.md §1 L5/L6, §3 call
stacks). One binary, subcommands:

    python -m crfr train --preset casia_arcface data.train_records=...
    python -m crfr train-sr --preset casia_arcface ...
    python -m crfr train-distill --teacher-ckpt DIR ...
    python -m crfr eval-verification --ckpt DIR --pairs pairs.txt --lfw-root R
    python -m crfr eval-scface --ckpt DIR --gallery G --probes P --distance 2
    python -m crfr eval-openset --ckpt DIR --gallery-list .. --mated-list ..
    python -m crfr eval-ijbc ...
    python -m crfr pack --root IMAGE_TREE --out records.array_record
    python -m crfr bench

Every trainer writes JSONL metrics and Orbax checkpoints; every eval prints
a single JSON object to stdout (machine-readable, like bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _approx_flag(args):
    """bool | float approx flag from --approx / --approx-recall.

    --approx-recall R (0 < R < 1) implies approx mode at recall_target R
    (identification._approx_cfg documents the recall characterization);
    bare --approx keeps the default target."""
    r = getattr(args, "approx_recall", 0.0) or 0.0
    if r:
        return float(r)
    return bool(getattr(args, "approx", False))


def _split_overrides(extra):
    return [a for a in extra if "=" in a and not a.startswith("-")]


def _load_cfg(args, extra):
    from crfr.configs import get_config
    return get_config(args.preset, _split_overrides(extra))


def _rank0_metrics(path: str, args):
    """JSONL/TB metrics writer on process 0 only; a silent writer
    elsewhere. On a pod-shared checkpoint dir, every rank appending the
    same file would interleave P duplicate copies of each row. Call AFTER
    maybe_initialize_distributed() (process_index is undefined before)."""
    import jax
    from crfr.utils.logging import MetricsWriter

    if jax.process_count() > 1 and jax.process_index() != 0:
        return MetricsWriter(stdout=False)
    return MetricsWriter(path,
                         tensorboard_dir=getattr(args, "tensorboard", None)
                         or None)


def _source_or_synthetic(cfg, path: str | None):
    if path:
        from crfr.data.records import open_source
        return open_source(path), None
    from crfr.data.synthetic import SyntheticFaces
    data = SyntheticFaces(num_classes=cfg.data.num_classes,
                          image_size=cfg.data.image_size)
    return None, data


def _recycle_exec(args, cfg, step: int):
    """Replace this training process with a fresh one resuming at ``step``.

    The supported form of the RSS-leak workaround BASELINE.md documents
    (the axon tunnel's PJRT client retains ~9 MB host RSS per device_put;
    week-long runs need periodic process recycling). Appends one record per
    generation to <checkpoint_dir>/recycles.jsonl, then os.execv's
    ``python -m crfr <original argv> --resume`` — never returns."""
    import resource

    gen = int(os.environ.get("CRFR_RECYCLE_GEN", "0")) + 1
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    with open(os.path.join(cfg.train.checkpoint_dir,
                           "recycles.jsonl"), "a") as f:
        f.write(json.dumps({"step": step, "gen": gen,
                            "max_rss_mb": round(rss_mb, 1)}) + "\n")
    argv = list(getattr(args, "_argv", sys.argv[1:]))
    if "--resume" not in argv:
        argv.append("--resume")
    os.environ["CRFR_RECYCLE_GEN"] = str(gen)
    print(f"recycling process at step {step} (gen {gen}, "
          f"max RSS {rss_mb:.0f} MB)", file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, "-m", "crfr"] + argv)


def cmd_headline(args, extra) -> int:
    """The paper's composed experiment (teacher → prior-aided SR-GAN →
    student+residual-KD → cross-resolution eval) as one run; HeadlineCfg
    fields are overridable as key=value extras (e.g. ids_train=32
    teacher_steps=400)."""
    import dataclasses

    from crfr.experiments.headline import (HeadlineCfg, ordering_holds,
                                           run_headline)

    defaults = HeadlineCfg()
    kv = {}
    for ov in _split_overrides(extra):
        k, v = ov.split("=", 1)
        if not hasattr(defaults, k):
            valid = [f.name for f in dataclasses.fields(HeadlineCfg)]
            raise KeyError(f"unknown headline field {k!r}; valid: {valid}")
        d = getattr(defaults, k)
        if isinstance(d, bool):              # bool("0") is True — parse it
            kv[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(d, tuple):
            kv[k] = tuple(int(x) for x in v.split(","))
        else:
            kv[k] = type(d)(v)
    kv.setdefault("probe_sizes",
                  tuple(int(s) for s in args.probe_sizes.split(",") if s))
    h = dataclasses.replace(defaults, out_dir=args.out, **kv)
    if args.seeds > 1:
        from crfr.experiments.headline import run_headline_seeds
        out = run_headline_seeds(h, args.seeds)
        print(json.dumps({"aggregate": out["aggregate"],
                          "total_s": out["total_s"]}))
        return 0
    table = run_headline(h)
    out = {"results": table["results"], "total_s": table["total_s"],
           "ordering": {str(p): ordering_holds(table, p)
                        for p in h.probe_sizes}}
    print(json.dumps(out))
    return 0


def cmd_train(args, extra) -> int:
    import jax
    from crfr.data.pipeline import PipelineCfg, train_batches
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer

    cfg = _load_cfg(args, extra)
    from crfr.parallel.multihost import (maybe_initialize_distributed,
                                         process_shard)
    distributed = maybe_initialize_distributed()
    metrics = _rank0_metrics(
        os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl"), args)

    tr = Trainer(cfg, steps_per_epoch=args.steps_per_epoch, metrics=metrics)
    ck = Checkpointer(cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints)
    if args.resume and ck.latest_step() is not None:
        tr.state = ck.restore(tr.state)
        print(f"resumed from step {ck.latest_step()}", file=sys.stderr)

    source, synth = _source_or_synthetic(cfg, cfg.data.train_records or None)
    multihost = distributed and jax.process_count() > 1
    # Multi-host DP input convention: each host's pipeline draws a DISTINCT
    # (batch/P)-row slab from its own contiguous index shard and places it
    # with host_put_local, so the GLOBAL batch stays cfg.train.batch_size
    # (the concatenation of per-host slabs) with zero cross-host data motion.
    local_bs = cfg.train.batch_size
    if multihost:
        assert cfg.train.batch_size % jax.process_count() == 0, (
            f"batch_size {cfg.train.batch_size} must divide over "
            f"{jax.process_count()} processes")
        local_bs = cfg.train.batch_size // jax.process_count()
    if source is not None and multihost:
        from crfr.data.records import SubsetSource
        lo, hi = process_shard(len(source))
        source = SubsetSource(source, lo, hi)
        print(f"host {jax.process_index()}/{jax.process_count()}: "
              f"records [{lo}, {hi}), local batch {local_bs}",
              file=sys.stderr)
    start = tr.sync_host_step()
    # Per-process data state: each host's grain iterator walks its OWN
    # record shard, so its resume state is private (a shared filename on a
    # pod-shared checkpoint dir would be last-writer-wins).
    data_state_path = os.path.join(
        cfg.train.checkpoint_dir,
        "data_state.json" if not multihost
        else f"data_state_{jax.process_index()}.json")
    if source is not None:
        data_state = None
        if args.resume and start and os.path.exists(data_state_path):
            with open(data_state_path) as f:
                saved = json.load(f)
            if saved.get("step") == start:     # exact-match resume only
                data_state = saved["state"]
        batches = train_batches(source, PipelineCfg(
            batch_size=local_bs, seed=cfg.train.seed,
            random_flip=cfg.data.random_flip, num_workers=args.workers),
            start_step=start, state=data_state)
    else:
        # fold the process index into the seed so hosts draw distinct
        # synthetic batches under the local-slab convention
        batches = synth.batches(local_bs, args.max_steps or 1000,
                                seed=cfg.train.seed
                                + (jax.process_index() if multihost else 0))

    # Double-buffered H2D feeding (H2D of batch i+1 overlaps step i); the
    # resumable variant tracks the grain state of the CONSUMED batch so
    # prefetch never breaks exact data resume.
    from crfr.train.feed import ResumableDeviceFeed, device_feed
    feed = (ResumableDeviceFeed(batches, tr.mesh, local=multihost)
            if source is not None
            else device_feed(batches, tr.mesh, local=multihost))

    def save(step: int, force: bool = False):
        ck.save(step, tr.state, cfg.to_json(), force=force)
        if source is not None:
            with open(data_state_path, "w") as f:
                json.dump({"step": step, "state": feed.state}, f)

    # In-training eval fn compiled ONCE; state_fn threads the live weights
    # through the single compiled program (no per-eval retrace).
    _eval_fn = None

    def in_loop_eval(step: int):
        # reference §3.1 "every N: evaluate(lfw)" — .bin verification set
        nonlocal _eval_fn
        if not args.eval_bin:
            return
        from crfr.data.bins import evaluate_bin
        from crfr.eval.extract import make_extract_fn

        if _eval_fn is None:
            if multihost:
                # The train program's weights are sharded over the GLOBAL
                # mesh; an eval program mixing them with per-host local
                # arrays raises (non-addressable inputs) in multi-controller
                # JAX. But the embed state is REPLICATED, hence locally
                # addressable: snapshot it to host and run eval as a purely
                # LOCAL single-device program — REDUNDANTLY on every host
                # (identical data → identical result). Redundancy is load-
                # bearing: if only one rank evaluated, the others would sit
                # in the next train step's collective past its timeout.
                from crfr.parallel.mesh import local_snapshot

                # snapshot once per trained step (state_fn runs per eval
                # BATCH; weights cannot change mid-eval, and per-batch
                # snapshots would D2H+H2D the whole tree every batch)
                snap_cache: dict = {}

                def _snap_state():
                    if snap_cache.get("step") != tr.host_step:
                        snap_cache.update(
                            step=tr.host_step,
                            state=local_snapshot(tr.embed_state()))
                    return snap_cache["state"]

                _eval_fn = make_extract_fn(
                    tr.backbone_apply,
                    state_fn=_snap_state,
                    degrade_to=cfg.data.eval_degrade_size,
                    resize_mode=cfg.data.resize_mode,
                    flip_fusion=cfg.eval.flip_fusion,
                    image_size=cfg.model.input_size)
            else:
                _eval_fn = make_extract_fn(
                    tr.backbone_apply, state_fn=tr.embed_state,
                    degrade_to=cfg.data.eval_degrade_size,
                    resize_mode=cfg.data.resize_mode,
                    flip_fusion=cfg.eval.flip_fusion,
                    image_size=cfg.model.input_size, mesh=tr.mesh)
        res = evaluate_bin(args.eval_bin, _eval_fn, cfg.eval.batch_size,
                           cfg.model.input_size, cfg.eval.n_folds)
        metrics.write(step, eval_accuracy=res.accuracy_mean,
                      eval_eer=res.eer)       # _rank0_metrics: p0-only file

    recycle_every = getattr(args, "recycle_every_steps", 0) or 0
    if recycle_every:
        assert not multihost, (
            "--recycle-every-steps is single-host only (a pod re-exec "
            "needs coordinated restarts across processes)")

    import time
    t0, n_img = time.time(), 0
    for i, (imgs, labels) in enumerate(feed):
        if args.max_steps and i + start >= args.max_steps:
            break
        m = tr.train_step(imgs, labels)
        n_img += local_bs
        step = tr.host_step      # async hot loop: no device sync per step
        if step % cfg.train.log_every == 0:
            # same record Trainer.fit logs — the CLI loop drives train_step
            # directly (exact data resume), so it logs directly too
            metrics.write(step, imgs_per_sec=n_img / (time.time() - t0),
                          lr=float(tr.schedule(step)),
                          **{k: float(jax.device_get(v))
                             for k, v in m.items()})
        if step % cfg.train.checkpoint_every_steps == 0:
            save(step)
        if step % cfg.train.eval_every_steps == 0:
            in_loop_eval(step)
        if (recycle_every and step - start >= recycle_every
                and not (args.max_steps and step >= args.max_steps)):
            # checkpoint, log, and replace this process with a fresh one
            # resuming exactly here (resume is bitwise; the metrics JSONL
            # appends across generations → one continuous stream)
            save(step, force=True)
            ck.close()
            _recycle_exec(args, cfg, step)
    step = tr.host_step
    if ck.latest_step() != step:      # last loop save may already cover it
        save(step, force=True)
    ck.close()
    print(json.dumps({"final_step": step}))
    return 0


def _distributed_feed(cfg, args, mesh, start: int = 0):
    """Shared data plumbing for the SR/distill trainers (the main trainer
    has its own exact-resume variant): multi-host record shard + local-slab
    batch size + double-buffered H2D device feed. Yields placed
    (images, labels) tuples."""
    import jax
    from crfr.train.feed import device_feed

    multihost = jax.process_count() > 1
    local_bs = cfg.train.batch_size
    if multihost:
        assert cfg.train.batch_size % jax.process_count() == 0
        local_bs = cfg.train.batch_size // jax.process_count()
    source, synth = _source_or_synthetic(cfg, cfg.data.train_records or None)
    if source is not None:
        from crfr.data.pipeline import PipelineCfg, train_batches
        if multihost:
            from crfr.data.records import SubsetSource
            from crfr.parallel.multihost import process_shard
            lo, hi = process_shard(len(source))
            source = SubsetSource(source, lo, hi)
            print(f"host {jax.process_index()}/{jax.process_count()}: "
                  f"records [{lo}, {hi}), local batch {local_bs}",
                  file=sys.stderr)
        batches = train_batches(source, PipelineCfg(
            batch_size=local_bs, seed=cfg.train.seed,
            random_flip=cfg.data.random_flip), start_step=start)
    else:
        batches = synth.batches(local_bs, args.max_steps or 1000,
                                seed=cfg.train.seed
                                + (jax.process_index() if multihost else 0))
    return device_feed(batches, mesh, local=multihost)


def cmd_train_sr(args, extra) -> int:
    from crfr.parallel.multihost import maybe_initialize_distributed
    from crfr.train.sr_loop import SRTrainer

    from crfr.train.checkpoints import Checkpointer

    maybe_initialize_distributed()
    cfg = _load_cfg(args, extra)
    metrics = _rank0_metrics(
        os.path.join(cfg.train.checkpoint_dir, "sr_metrics.jsonl"), args)
    teacher_fn = None
    if args.teacher_ckpt:
        # identity loss ‖T(sr) − T(hr)‖ via a frozen recognition backbone
        from crfr.configs import Config
        from crfr.train.distill_loop import teacher_from_trainer
        from crfr.train.loop import Trainer
        tck = Checkpointer(args.teacher_ckpt, keep=1)
        tcfg_dict = tck.restore_config()
        tcfg = Config.from_dict(tcfg_dict) if tcfg_dict else cfg
        teacher_tr = Trainer(tcfg, steps_per_epoch=1000)
        teacher_tr.state = tck.restore(teacher_tr.state)
        teacher_fn = teacher_from_trainer(teacher_tr)
    perceptual_fn = None
    if args.perceptual > 0:
        assert args.teacher_ckpt, "--perceptual requires --teacher-ckpt"
        from crfr.train.sr_loop import perceptual_from_trainer
        cfg = cfg.override(**{"loss.sr_perceptual_weight": args.perceptual})
        perceptual_fn = perceptual_from_trainer(teacher_tr)
    tr = SRTrainer(cfg, scale=args.scale, metrics=metrics,
                   teacher_fn=teacher_fn, perceptual_fn=perceptual_fn,
                   bicubic_skip=bool(args.bicubic_skip),
                   lr_g=args.lr_g, lr_d=args.lr_d,
                   schedule=args.schedule, warmup_steps=args.warmup_steps,
                   total_steps=args.max_steps or 100_000,
                   n_d_steps=args.n_d_steps, r1_gamma=args.r1_gamma)
    ck = Checkpointer(os.path.join(cfg.train.checkpoint_dir, "sr"),
                      keep=cfg.train.keep_checkpoints)
    if args.resume and ck.latest_step() is not None:
        tr.restore_from(ck)
        print(f"resumed SR from step {tr.step}", file=sys.stderr)
    m = {}
    start = tr.step
    for i, (imgs, _) in enumerate(_distributed_feed(cfg, args, tr.mesh,
                                                    start=start)):
        if args.max_steps and i + start >= args.max_steps:
            break
        m = tr.train_step(imgs)
        if tr.step % cfg.train.checkpoint_every_steps == 0:
            ck.save(tr.step, tr.state_dict(), cfg.to_json())
    if tr.step and ck.latest_step() != tr.step:
        ck.save(tr.step, tr.state_dict(), cfg.to_json(), force=True)
    ck.close()
    print(json.dumps({"g_loss": float(m.get("g_loss", float("nan"))),
                      "d_loss": float(m.get("d_loss", float("nan"))),
                      "steps": tr.step}))
    return 0


def cmd_train_distill(args, extra) -> int:
    import jax
    from crfr.parallel.multihost import maybe_initialize_distributed
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.distill_loop import DistillTrainer, teacher_from_trainer
    from crfr.train.loop import Trainer
    from crfr.configs import Config

    maybe_initialize_distributed()
    cfg = _load_cfg(args, extra)
    if cfg.loss.distill_weight <= 0:
        cfg = cfg.override(**{"loss.distill_weight": args.kd_weight})

    tck = Checkpointer(args.teacher_ckpt, keep=1)
    tcfg_dict = tck.restore_config()
    tcfg = Config.from_dict(tcfg_dict) if tcfg_dict else cfg
    teacher_tr = Trainer(tcfg, steps_per_epoch=1000)
    teacher_tr.state = tck.restore(teacher_tr.state)

    metrics = _rank0_metrics(
        os.path.join(cfg.train.checkpoint_dir, "distill_metrics.jsonl"), args)
    sr_fn = sr_module = None
    if getattr(args, "sr_finetune", False):
        # joint G fine-tuning: restore the hallucinator as a TRAINABLE
        # module (its state checkpoints with the student from here on)
        assert args.sr_ckpt, "--sr-finetune requires --sr-ckpt"
        from crfr.train.checkpoints import Checkpointer as _Ck
        from crfr.train.sr_loop import SRTrainer
        sr_tr = SRTrainer(cfg, scale=args.sr_scale,
                          bicubic_skip=bool(args.sr_bicubic_skip))
        _ck = _Ck(args.sr_ckpt, keep=1)
        sr_tr.restore_from(_ck)
        _ck.close()
        sr_module = (sr_tr.g_graphdef, sr_tr._serve_state(ema=True))
    else:
        sr_fn = _sr_apply_if_requested(args, cfg)   # frozen-G mode
    st = DistillTrainer(cfg, teacher_from_trainer(teacher_tr),
                        metrics=metrics, sr_fn=sr_fn, sr_scale=args.sr_scale,
                        sr_module=sr_module, sr_lr=args.sr_lr,
                        sr_pixel_weight=args.sr_pixel_weight)
    sck = Checkpointer(os.path.join(cfg.train.checkpoint_dir, "student"),
                       keep=cfg.train.keep_checkpoints)
    if args.resume and sck.latest_step() is not None:
        st.load_state_dict(sck.restore(st.state_dict()))
        print(f"resumed student from step {st.step}", file=sys.stderr)
    multihost = jax.process_count() > 1
    # live state; under multi-host every rank evals redundantly on a LOCAL
    # state snapshot (same convention as cmd_train — keeps ranks in
    # lockstep instead of parking them in a collective)
    student_embed = st.student_embed_fn(with_residual=True,
                                        local_snapshot=multihost)

    def in_loop_eval(step: int):
        # verification of the distilled student on a .bin pair set
        if not args.eval_bin:
            return
        from crfr.data.bins import evaluate_bin
        res = evaluate_bin(args.eval_bin, student_embed, cfg.eval.batch_size,
                           cfg.model.input_size, cfg.eval.n_folds)
        metrics.write(step, eval_accuracy=res.accuracy_mean,
                      eval_eer=res.eer)       # _rank0_metrics: p0-only file

    m = {}
    start = st.step
    for i, (imgs, labels) in enumerate(_distributed_feed(cfg, args, st.mesh,
                                                         start=start)):
        if args.max_steps and i + start >= args.max_steps:
            break
        m = st.train_step(imgs, labels)
        if st.step % cfg.train.checkpoint_every_steps == 0:
            sck.save(st.step, st.state_dict(), cfg.to_json())
        if st.step % cfg.train.eval_every_steps == 0:
            in_loop_eval(st.step)
    if st.step and sck.latest_step() != st.step:
        sck.save(st.step, st.state_dict(), cfg.to_json(), force=True)
    sck.close()
    print(json.dumps({k: float(jax.device_get(v)) for k, v in m.items()}
                     | {"steps": st.step}))
    return 0


def _sr_apply_if_requested(args, cfg):
    """--sr-ckpt DIR → frozen hallucinator plug (or None). Used to route
    probes through G before embedding (hallucination-aided recognition)."""
    if not getattr(args, "sr_ckpt", ""):
        return None
    from crfr.train.sr_loop import load_sr_apply
    return load_sr_apply(args.sr_ckpt, cfg, scale=args.sr_scale,
                         bicubic_skip=bool(getattr(args, "sr_bicubic_skip",
                                                   1)))


def _load_gallery(path: str, labels_path: str = ""):
    """Load a gallery for the identification paths: float ``.npy`` matrix
    or an int8 ``.npz`` QuantBank (from ``crfr extract --quantize-bank``).
    Returns (gallery, labels) where gallery feeds ``topk_matches``
    directly; labels default to the bank's stored labels / the row index."""
    import numpy as np

    if path.endswith(".npz"):
        from crfr.eval.bank import load_bank
        bank = load_bank(path)
        lab = np.load(labels_path) if labels_path else bank.labels
        return bank, lab
    g = np.load(path)
    lab = np.load(labels_path) if labels_path else np.arange(len(g))
    return g, lab


def _backbone_apply(tr, cfg, args, sample_paths=(), degrade_to=None):
    """Float (default) or --int8 PTQ backbone apply for the serving-side
    commands (extract / match / export). int8 runs the s8×s8→s32 MXU conv
    path (models/quant.py; 1.6× measured on-chip vs bf16), calibrated on up
    to two batches of the run's OWN inputs pushed through the same
    degrade+normalize front end — or degraded noise when the command has no
    images (export without a --calib-list).

    ``degrade_to`` MUST be the exact value the caller passes to
    make_extract_fn/build_serving_fn: calibrating on a different front end
    (e.g. blurred 16px images when serving native-res) mis-scales the
    activation absmax and the int8 path silently clips. (With --sr-ckpt the
    calibration uses the plain down-up operator rather than G's output —
    same dynamic range, absmax calibration is insensitive to that.)"""
    if not getattr(args, "int8", False):
        return lambda x: tr.model.backbone(x, train=False)
    import numpy as np
    import jax.numpy as jnp
    from crfr.models.quant import quantize_backbone
    from crfr.ops.bicubic import degrade_matrix
    from crfr.ops.normalize import normalize

    size = cfg.model.input_size
    w = (jnp.asarray(degrade_matrix(size, degrade_to, cfg.data.resize_mode))
         if degrade_to else None)

    def prep(raw):
        x = jnp.asarray(raw, jnp.float32)
        if w is not None:
            x = jnp.einsum("oi,bijc,pj->bopc", w, x, w)
        return np.asarray(normalize(x), np.float32)

    calib = []
    if sample_paths:
        from crfr.data.pipeline import embed_batches
        n = min(len(sample_paths), 2 * cfg.eval.batch_size)
        for imgs, _ in embed_batches(list(sample_paths)[:n],
                                     cfg.eval.batch_size, size):
            calib.append(prep(imgs))
            if len(calib) >= 2:
                break
    else:
        rng = np.random.default_rng(0)
        calib = [prep(rng.integers(0, 256, (32, size, size, 3)))]
    qbb = quantize_backbone(tr.model.backbone, calib)
    return lambda x: qbb(x, train=False)


def _embed_fn_from_ckpt(args, extra):
    """Rebuild a Trainer from config+checkpoint → jitted raw-pixel embed."""
    import jax
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer
    from crfr.configs import Config

    ck = Checkpointer(args.ckpt, keep=1)
    cfg_dict = ck.restore_config()
    if cfg_dict is not None:
        from crfr.configs import parse_overrides
        cfg = Config.from_dict(cfg_dict)
        kv = parse_overrides(_split_overrides(extra))
        if kv:                   # CLI key=value wins over the ckpt's config
            cfg = cfg.override(**kv)
    else:
        cfg = _load_cfg(args, extra)
    tr = Trainer(cfg, steps_per_epoch=1000)
    tr.state = ck.restore(tr.state)
    return tr, cfg


def cmd_eval_verification(args, extra) -> int:
    from crfr.data.datasets import parse_lfw_pairs
    from crfr.eval.extract import extract_embeddings, make_extract_fn
    from crfr.eval.verification import evaluate_verification

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    proto = parse_lfw_pairs(args.pairs, args.lfw_root)
    degrade = args.degrade or cfg.data.eval_degrade_size
    sr_apply = _sr_apply_if_requested(args, cfg)
    if sr_apply is not None and not degrade:
        degrade = cfg.model.input_size // args.sr_scale
    backbone = lambda x: tr.model.backbone(x, train=False)  # noqa: E731
    kw = dict(resize_mode=cfg.data.resize_mode,
              flip_fusion=cfg.eval.flip_fusion,
              image_size=cfg.model.input_size, mesh=tr.mesh)
    fn_hr = make_extract_fn(backbone, degrade_to=None, **kw)
    # LR side: bicubic down→up, or down→G↑ when --sr-ckpt is given
    # (hallucination-aided recognition — the paper's eval protocol).
    fn_lr = make_extract_fn(backbone, degrade_to=degrade, sr_apply=sr_apply,
                            **kw)
    # Cross-resolution protocol: degrade only the PROBE side of each pair
    # (--degrade-side second, BASELINE "16×16→112 bicubic probe
    # degradation"); 'both' reproduces symmetric-LR protocols.
    side = args.degrade_side if degrade else "none"
    f1 = fn_lr if side in ("first", "both") else fn_hr
    f2 = fn_lr if side in ("second", "both") else fn_hr
    e1 = extract_embeddings(proto.path1, f1, cfg.eval.batch_size,
                            cfg.model.input_size)
    e2 = extract_embeddings(proto.path2, f2, cfg.eval.batch_size,
                            cfg.model.input_size)
    res = evaluate_verification(e1, e2, proto.issame, proto.n_folds,
                                cfg.eval.far_targets)
    print(json.dumps({"accuracy": res.accuracy_mean, "std": res.accuracy_std,
                      "eer": res.eer, "tar_at_far": res.tar_at_far}))
    return 0


def cmd_eval_scface(args, extra) -> int:
    from crfr.data.datasets import scface_split
    from crfr.eval.extract import extract_embeddings, make_extract_fn
    from crfr.eval.identification import closed_set_identification

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    split = scface_split(args.gallery, args.probes, args.distance)
    backbone = lambda x: tr.model.backbone(x, train=False)  # noqa: E731
    fn = make_extract_fn(backbone, flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size, mesh=tr.mesh)
    sr_apply = _sr_apply_if_requested(args, cfg)
    if sr_apply is not None:
        # PROBES routed through the hallucinator: ↓ to the G input size
        # (approximates the native-LR surveillance probe), G ↑, embed.
        fn_p = make_extract_fn(
            backbone, degrade_to=cfg.model.input_size // args.sr_scale,
            sr_apply=sr_apply, resize_mode=cfg.data.resize_mode,
            flip_fusion=cfg.eval.flip_fusion,
            image_size=cfg.model.input_size, mesh=tr.mesh)
    else:
        fn_p = fn
    g = extract_embeddings(split.gallery_paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    p = extract_embeddings(split.probe_paths, fn_p, cfg.eval.batch_size, cfg.model.input_size)
    res = closed_set_identification(p, g, split.probe_labels,
                                    split.gallery_labels,
                                    mesh=_topk_mesh(tr),
                                    block=cfg.eval.gallery_block)
    print(json.dumps({"rank1": res.rank1, "cmc": res.cmc.tolist()}))
    return 0


def _topk_mesh(tr=None):
    """Mesh for the streaming/sharded gallery top-k: the trainer's mesh (or
    every visible device when no model is loaded); None when single-device
    (the plain streaming scan needs no mesh)."""
    from crfr.parallel.mesh import make_mesh

    mesh = tr.mesh if tr is not None else make_mesh(None)
    return mesh if mesh.devices.size > 1 else None


def cmd_eval_openset(args, extra) -> int:
    """TinyFace / QMUL-SurvFace native-LR open-set identification
    (BASELINE config 3): full CMC + TPIR@FPIR over the distractor-augmented
    gallery, streamed in blocks (never materializing probes × gallery).

    Two input modes: image lists (embeds with --ckpt; probes optionally
    routed through the hallucinator via --sr-ckpt, exactly as eval-scface
    does), or precomputed embeddings (--probe-npy/--gallery-npy + labels,
    e.g. from `crfr extract`) which needs no model at all."""
    import numpy as np

    from crfr.eval.identification import open_set_identification

    if args.probe_npy:
        for need in ("gallery_npy", "probe_labels_npy", "mated_npy"):
            assert getattr(args, need), f"--probe-npy mode needs --{need.replace('_', '-')}"
        assert args.gallery_labels_npy or args.gallery_npy.endswith(".npz"), \
            "--probe-npy mode needs --gallery-labels-npy (or a .npz bank)"
        g, glab = _load_gallery(args.gallery_npy, args.gallery_labels_npy)
        p = np.load(args.probe_npy)
        plab = np.load(args.probe_labels_npy)
        mated = np.load(args.mated_npy).astype(bool)
        cfg = _load_cfg(args, extra)
        mesh = _topk_mesh()
    else:
        from crfr.data.datasets import open_set_split
        from crfr.eval.extract import extract_embeddings, make_extract_fn

        assert args.ckpt and args.gallery_list and args.mated_list and \
            args.unmated_list, ("image-list mode needs --ckpt "
                                "--gallery-list --mated-list --unmated-list "
                                "(or use --probe-npy)")
        tr, cfg = _embed_fn_from_ckpt(args, extra)
        split = open_set_split(args.gallery_list, args.mated_list,
                               args.unmated_list, args.root)
        backbone = lambda x: tr.model.backbone(x, train=False)  # noqa: E731
        kw = dict(resize_mode=cfg.data.resize_mode,
                  flip_fusion=cfg.eval.flip_fusion,
                  image_size=cfg.model.input_size, mesh=tr.mesh)
        fn_g = make_extract_fn(backbone, **kw)
        sr_apply = _sr_apply_if_requested(args, cfg)
        degrade = args.degrade or cfg.data.eval_degrade_size
        if sr_apply is not None and not degrade:
            degrade = cfg.model.input_size // args.sr_scale
        # PROBES (the native-LR side) optionally degraded and/or routed
        # through the hallucinator; the HR gallery never is.
        fn_p = (make_extract_fn(backbone, degrade_to=degrade,
                                sr_apply=sr_apply, **kw)
                if (degrade or sr_apply is not None) else fn_g)
        g = extract_embeddings(split.gallery_paths, fn_g, cfg.eval.batch_size,
                               cfg.model.input_size)
        p = extract_embeddings(split.probe_paths, fn_p, cfg.eval.batch_size,
                               cfg.model.input_size)
        glab, plab, mated = (split.gallery_labels, split.probe_labels,
                             split.probe_mated)
        mesh = _topk_mesh(tr)
    res = open_set_identification(p, g, plab, glab, mated,
                                  cfg.eval.fpir_targets,
                                  max_rank=args.max_rank, mesh=mesh,
                                  block=cfg.eval.gallery_block,
                                  approx=_approx_flag(args))
    print(json.dumps({"rank1": res.rank1, "cmc": res.cmc.tolist(),
                      "tpir_at_fpir": res.tpir_at_fpir}))
    return 0


def cmd_eval_bin(args, extra) -> int:
    """insightface .bin verification set (lfw.bin / cfp_fp.bin / agedb.bin)."""
    from crfr.data.bins import evaluate_bin
    from crfr.eval.extract import make_extract_fn

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    sr_apply = _sr_apply_if_requested(args, cfg)
    degrade = args.degrade or cfg.data.eval_degrade_size
    if sr_apply is not None and not degrade:
        degrade = cfg.model.input_size // args.sr_scale
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         degrade_to=degrade, sr_apply=sr_apply,
                         resize_mode=cfg.data.resize_mode,
                         flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size, mesh=tr.mesh)
    res = evaluate_bin(args.bin, fn, cfg.eval.batch_size,
                       cfg.model.input_size, cfg.eval.n_folds,
                       cfg.eval.far_targets)
    print(json.dumps({"accuracy": res.accuracy_mean, "std": res.accuracy_std,
                      "eer": res.eer, "tar_at_far": res.tar_at_far}))
    return 0


def _read_ijbc_meta(path: str, root: str):
    """'path template_id media_id subject_id' per line → lists."""
    paths, tids, mids, sids = [], [], [], []
    with open(path) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) < 4:
                continue
            paths.append(os.path.join(root, parts[0]))
            tids.append(int(parts[1]))
            mids.append(int(parts[2]))
            sids.append(int(parts[3]))
    import numpy as np
    return paths, np.asarray(tids), np.asarray(mids), np.asarray(sids)


def cmd_eval_ijbc(args, extra) -> int:
    """IJB-C. 1:1 (--meta + --pairs 't1 t2 label' lines) and/or 1:N
    (--probe-meta + --gallery-g1 + --gallery-g2, each a meta CSV
    'path template_id media_id subject_id'; results averaged over the two
    gallery splits, the standard protocol)."""
    import numpy as np

    from crfr.eval.extract import extract_embeddings, make_extract_fn
    from crfr.eval.ijbc import ijbc_11, ijbc_1n_two_gallery, pool_meta

    if args.probe_tpl_npy:
        # precomputed POOLED template embeddings (1:N only; no model needed)
        cfg = _load_cfg(args, extra)
        avg, r1, r2 = ijbc_1n_two_gallery(
            np.load(args.probe_tpl_npy), np.load(args.probe_subjects_npy),
            np.load(args.g1_tpl_npy), np.load(args.g1_subjects_npy),
            np.load(args.g2_tpl_npy), np.load(args.g2_subjects_npy),
            fpir_targets=cfg.eval.fpir_targets, mesh=_topk_mesh(),
            block=cfg.eval.gallery_block, approx=_approx_flag(args))
        print(json.dumps({"rank1": avg.rank1,
                          "cmc": np.asarray(avg.cmc).tolist(),
                          "tpir_at_fpir": avg.tpir_at_fpir,
                          "rank1_g1": r1.rank1, "rank1_g2": r2.rank1}))
        return 0

    assert args.ckpt, "--ckpt required (or precomputed --probe-tpl-npy mode)"
    tr, cfg = _embed_fn_from_ckpt(args, extra)
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size, mesh=tr.mesh)
    out: dict = {}

    def pooled(meta_path):
        paths, tids, mids, sids = _read_ijbc_meta(meta_path, args.root)
        embs = extract_embeddings(paths, fn, cfg.eval.batch_size,
                                  cfg.model.input_size)
        return pool_meta(embs, tids, mids, sids)

    if args.meta and args.pairs:
        paths, tids, mids, sids = _read_ijbc_meta(args.meta, args.root)
        t1, t2, lab = [], [], []
        with open(args.pairs) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) == 3:
                    t1.append(int(parts[0]))
                    t2.append(int(parts[1]))
                    lab.append(int(parts[2]))
        embs = extract_embeddings(paths, fn, cfg.eval.batch_size,
                                  cfg.model.input_size)
        res = ijbc_11(embs, tids, mids,
                      np.asarray(t1), np.asarray(t2), np.asarray(lab))
        out["tar_at_far"] = res.tar_at_far
    if args.probe_meta and args.gallery_g1 and args.gallery_g2:
        p_emb, p_subj, _ = pooled(args.probe_meta)
        g1_emb, g1_subj, _ = pooled(args.gallery_g1)
        g2_emb, g2_subj, _ = pooled(args.gallery_g2)
        avg, r1, r2 = ijbc_1n_two_gallery(
            p_emb, p_subj, g1_emb, g1_subj, g2_emb, g2_subj,
            fpir_targets=cfg.eval.fpir_targets, mesh=_topk_mesh(tr),
            block=cfg.eval.gallery_block, approx=_approx_flag(args))
        out["rank1"] = avg.rank1
        out["cmc"] = np.asarray(avg.cmc).tolist()
        out["tpir_at_fpir"] = avg.tpir_at_fpir
        out["rank1_g1"] = r1.rank1
        out["rank1_g2"] = r2.rank1
    if not out:
        print("eval-ijbc: nothing to do — pass --meta/--pairs (1:1) "
              "and/or --probe-meta/--gallery-g1/--gallery-g2 (1:N)",
              file=sys.stderr)
        return 2
    print(json.dumps(out))
    return 0


def cmd_import_torch(args, extra) -> int:
    """Import a face.evoLVe-convention torch checkpoint into an Orbax
    checkpoint directory usable by every crfr eval/train driver."""
    import torch

    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer
    from crfr.train.torch_import import load_face_evolve_state_dict

    cfg = _load_cfg(args, extra)
    sd = torch.load(args.torch_ckpt, map_location="cpu",
                    weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tr = Trainer(cfg, steps_per_epoch=1000)
    model = tr.model
    load_face_evolve_state_dict(model.backbone, sd)
    from flax import nnx
    _, params, bstats, rngs = nnx.split(model, nnx.Param, nnx.BatchStat,
                                        nnx.RngState)
    tr.state["params"] = params
    tr.state["batch_stats"] = bstats
    ck = Checkpointer(args.out, keep=1)
    ck.save(0, tr.state, cfg.to_json(), force=True)
    ck.close()
    print(json.dumps({"out": args.out, "keys": len(sd)}))
    return 0


def cmd_extract(args, extra) -> int:
    """Batch feature extraction: image list file (one path per line, or
    'path label') → .npy embedding matrix (+ optional labels .npy)."""
    import numpy as np

    from crfr.eval.extract import extract_embeddings, make_extract_fn

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    paths, labels = [], []
    with open(args.list) as f:
        for ln in f:
            parts = ln.split()
            if not parts:
                continue
            paths.append(os.path.join(args.root, parts[0]))
            labels.append(int(parts[1]) if len(parts) > 1 else -1)
    fn = make_extract_fn(_backbone_apply(tr, cfg, args, paths,
                                         degrade_to=args.degrade or None),
                         degrade_to=args.degrade or None,
                         resize_mode=cfg.data.resize_mode,
                         flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size, mesh=tr.mesh)
    embs = extract_embeddings(paths, fn, cfg.eval.batch_size,
                              cfg.model.input_size)
    if args.quantize_bank:
        from crfr.eval.bank import quantize_bank, save_bank
        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        lab = (np.asarray(labels) if any(l >= 0 for l in labels) else None)
        save_bank(out, quantize_bank(embs, lab))
        print(json.dumps({"out": out, "count": len(paths),
                          "dim": int(embs.shape[1]) if len(embs) else 0,
                          "quantized_bank": True}))
        return 0
    np.save(args.out, embs)
    if any(l >= 0 for l in labels):
        np.save(args.out.replace(".npy", "") + "_labels.npy",
                np.asarray(labels))
    print(json.dumps({"out": args.out, "count": len(paths),
                      "dim": int(embs.shape[1]) if len(embs) else 0}))
    return 0


def cmd_export(args, extra) -> int:
    """AOT serving export: checkpoint → portable StableHLO artifact
    (weights baked, optional degrade / hallucinator / flip-TTA)."""
    from crfr.serve import export_embed

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    sr_apply = _sr_apply_if_requested(args, cfg)
    degrade = args.degrade or cfg.data.eval_degrade_size
    if sr_apply is not None and not degrade:
        degrade = cfg.model.input_size // args.sr_scale
    meta = export_embed(tr, args.out, batch=args.batch,
                        degrade_to=degrade or None,
                        flip_tta=args.flip_tta, sr_apply=sr_apply,
                        backbone_apply=_backbone_apply(
                            tr, cfg, args, degrade_to=degrade or None),
                        quantized=bool(args.int8))
    print(json.dumps(meta | {"out": args.out}))
    return 0


def cmd_pack(args, extra) -> int:
    from crfr.data.records import pack_image_folder, write_array_record, write_pack

    writer = write_pack if args.out.endswith(".crfrpack") else write_array_record
    if args.from_rec:
        # MXNet RecordIO (insightface MS1M train.rec) → crfr records
        from crfr.data.mxrec import convert_rec
        n, c = convert_rec(args.from_rec, args.out,
                           idx_path=args.idx or None, writer=writer)
    else:
        n, c = pack_image_folder(args.root, args.out, size=args.size,
                                 writer=writer)
    print(json.dumps({"images": n, "identities": c, "out": args.out}))
    return 0


def cmd_match(args, extra) -> int:
    """Serving-side identification: probes (images via --ckpt, or an
    embeddings .npy) against a gallery embedding bank → top-k identities
    per probe, via the streaming/sharded gallery scan (no (N, M) buffer).
    Pairs with `crfr extract` for bank building."""
    import numpy as np

    from crfr.eval.identification import topk_matches

    g, glab = _load_gallery(args.gallery_npy, args.gallery_labels_npy)
    if args.probe_npy:
        p = np.load(args.probe_npy)
        cfg = _load_cfg(args, extra)
        mesh = _topk_mesh()
    else:
        assert args.ckpt and args.list, \
            "need --probe-npy, or --ckpt + --list of probe images"
        from crfr.eval.extract import extract_embeddings, make_extract_fn

        tr, cfg = _embed_fn_from_ckpt(args, extra)
        paths = [os.path.join(args.root, ln.split()[0])
                 for ln in open(args.list) if ln.split()]
        sr_apply = _sr_apply_if_requested(args, cfg)
        degrade = args.degrade or cfg.data.eval_degrade_size
        if sr_apply is not None and not degrade:
            degrade = cfg.model.input_size // args.sr_scale
        fn = make_extract_fn(_backbone_apply(tr, cfg, args, paths,
                                             degrade_to=degrade or None),
                             degrade_to=degrade or None, sr_apply=sr_apply,
                             resize_mode=cfg.data.resize_mode,
                             flip_fusion=cfg.eval.flip_fusion,
                             image_size=cfg.model.input_size, mesh=tr.mesh)
        p = extract_embeddings(paths, fn, cfg.eval.batch_size,
                               cfg.model.input_size)
        mesh = _topk_mesh(tr)
    scores, labels = topk_matches(p, g, glab, k=args.k,
                                  block=cfg.eval.gallery_block, mesh=mesh,
                                  approx=_approx_flag(args))
    out = [{"labels": labels[i].tolist(),
            "scores": [round(float(s), 4) for s in scores[i]]}
           for i in range(len(labels))]
    print(json.dumps({"matches": out, "k": args.k, "gallery": len(g)}))
    return 0


def cmd_serve_http(args, extra) -> int:
    """HTTP inference daemon on an AOT artifact (serve_http.py):
    /healthz, /embed (.npy in/out, request coalescing), /match (top-k
    against an int8 .npz gallery bank)."""
    from crfr.serve_http import serve_artifact

    srv = serve_artifact(args.artifact, gallery_npz=args.gallery_npz,
                         host=args.host, port=args.port,
                         window_ms=args.window_ms,
                         mutable=args.mutable_gallery,
                         slab=args.gallery_slab)
    host, port = srv.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "artifact": args.artifact,
                      "gallery": bool(args.gallery_npz),
                      "mutable": args.mutable_gallery}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.service.close()
        srv.server_close()
    return 0


def cmd_bench(args, extra) -> int:
    from crfr.bench.throughput import run_throughput

    res = run_throughput(batch=args.batch, steps=args.steps,
                         int8=bool(args.int8))
    print(json.dumps({"imgs_per_sec": res.imgs_per_sec,
                      "per_batch_ms": res.per_batch_ms,
                      "int8": bool(args.int8)}))
    return 0


def _add_sr_args(p, help_ckpt: str):
    """Flags for the frozen-hallucinator plug shared by every consumer of
    --sr-ckpt (evals, export, distill)."""
    p.add_argument("--sr-ckpt", default="", help=help_ckpt)
    p.add_argument("--sr-scale", type=int, default=8)
    p.add_argument("--sr-bicubic-skip", type=int, default=1,
                   help="1 if the SR ckpt was trained with the bicubic-skip "
                        "coarse path (format v2 default), 0 for pre-v2 ckpts")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="crfr")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train")
    p.add_argument("--preset", default="casia_arcface")
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--steps-per-epoch", type=int, default=1000)
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-bin", default="",
                   help=".bin verification set for in-training eval")
    p.add_argument("--tensorboard", default="",
                   help="also mirror metrics to TensorBoard event files")
    p.add_argument("--recycle-every-steps", type=int, default=0,
                   help="checkpoint and exec a fresh process every N steps "
                        "(resume is bitwise) — bounds host RSS growth under "
                        "PJRT-client leaks on week-long runs (BASELINE.md "
                        "documents ~9 MB retained per transfer on the axon "
                        "tunnel); single-host only")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-sr")
    p.add_argument("--preset", default="casia_arcface")
    p.add_argument("--scale", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--teacher-ckpt", default="",
                   help="recognition ckpt for the SR identity loss")
    p.add_argument("--perceptual", type=float, default=0.0,
                   help="weight of the recognition-feature perceptual loss "
                        "(teacher stage features; needs --teacher-ckpt)")
    p.add_argument("--bicubic-skip", type=int, default=1,
                   help="train G with the fixed bicubic-up skip connection "
                        "(G == bicubic at init; format v2 default)")
    p.add_argument("--lr-g", type=float, default=1e-4)
    p.add_argument("--lr-d", type=float, default=1e-4)
    p.add_argument("--schedule", default="constant",
                   choices=("constant", "cosine"),
                   help="Adam LR schedule over --max-steps (G and D)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--n-d-steps", type=int, default=1,
                   help="discriminator updates per generator update")
    p.add_argument("--r1-gamma", type=float, default=0.0,
                   help="R1 gradient-penalty weight on the D step (0 = off)")
    p.add_argument("--tensorboard", default="",
                   help="also mirror metrics to TensorBoard event files")
    p.set_defaults(fn=cmd_train_sr)

    p = sub.add_parser("train-distill")
    p.add_argument("--preset", default="casia_arcface")
    p.add_argument("--teacher-ckpt", required=True)
    p.add_argument("--kd-weight", type=float, default=1.0)
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    _add_sr_args(p, "hallucinator ckpt: student consumes G(lr)")
    p.add_argument("--sr-finetune", action="store_true",
                   help="fine-tune G jointly with the student (needs "
                        "--sr-ckpt); G state checkpoints with the student")
    p.add_argument("--sr-lr", type=float, default=1e-5)
    p.add_argument("--sr-pixel-weight", type=float, default=0.3,
                   help="L1 pixel anchor weight for joint G fine-tuning")
    p.add_argument("--eval-bin", default="",
                   help=".bin verification set for in-training student eval")
    p.add_argument("--tensorboard", default="",
                   help="also mirror metrics to TensorBoard event files")
    p.set_defaults(fn=cmd_train_distill)

    p = sub.add_parser("eval-verification")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--pairs", required=True)
    p.add_argument("--lfw-root", required=True)
    p.add_argument("--preset", default="lfw_ir50_16px")
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--degrade-side", default="second",
                   choices=("first", "second", "both"))
    _add_sr_args(p, "route degraded side through the hallucinator")
    p.set_defaults(fn=cmd_eval_verification)

    p = sub.add_parser("eval-scface")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--gallery", required=True)
    p.add_argument("--probes", required=True)
    p.add_argument("--distance", type=int, default=1, choices=(1, 2, 3))
    p.add_argument("--preset", default="scface")
    _add_sr_args(p, "route probes through the hallucinator")
    p.set_defaults(fn=cmd_eval_scface)

    p = sub.add_parser("eval-openset")
    p.add_argument("--ckpt", default="",
                   help="recognition ckpt (image-list mode)")
    p.add_argument("--gallery-list", default="")
    p.add_argument("--mated-list", default="")
    p.add_argument("--unmated-list", default="")
    p.add_argument("--root", default="")
    p.add_argument("--degrade", type=int, default=0,
                   help="bicubic probe degradation size (0 = native res)")
    p.add_argument("--max-rank", type=int, default=20,
                   help="CMC depth (rank-1/5/10/20 tables)")
    _add_sr_args(p, "route probes through the hallucinator")
    p.add_argument("--probe-npy", default="",
                   help="precomputed probe embeddings .npy (skips --ckpt)")
    p.add_argument("--probe-labels-npy", default="")
    p.add_argument("--gallery-npy", default="")
    p.add_argument("--gallery-labels-npy", default="")
    p.add_argument("--mated-npy", default="",
                   help="bool .npy: probe enrolled in gallery")
    p.add_argument("--approx", action="store_true",
                   help="binned approx_max_k gallery selection (1.9× "
                        "faster huge-distractor scans; protocol default "
                        "is exact)")
    p.add_argument("--approx-recall", type=float, default=0.0,
                   help="approx_max_k recall_target in (0, 1); implies "
                        "--approx. 0.999 defeats the adversarial "
                        "stride-aliased layout (see eval/identification)")
    p.add_argument("--preset", default="tinyface_survface")
    p.set_defaults(fn=cmd_eval_openset)

    p = sub.add_parser("eval-bin")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--bin", required=True)
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--preset", default="lfw_ir50_16px")
    _add_sr_args(p, "route degraded probes through the hallucinator")
    p.set_defaults(fn=cmd_eval_bin)

    p = sub.add_parser("eval-ijbc")
    p.add_argument("--ckpt", default="", help="recognition ckpt (meta mode)")
    p.add_argument("--meta", default="", help="1:1 image meta CSV")
    p.add_argument("--pairs", default="", help="1:1 't1 t2 label' lines")
    p.add_argument("--probe-meta", default="", help="1:N probe meta CSV")
    p.add_argument("--gallery-g1", default="", help="1:N gallery split 1")
    p.add_argument("--gallery-g2", default="", help="1:N gallery split 2")
    p.add_argument("--root", default="")
    p.add_argument("--probe-tpl-npy", default="",
                   help="precomputed pooled probe templates .npy (1:N, "
                        "skips --ckpt)")
    p.add_argument("--probe-subjects-npy", default="")
    p.add_argument("--g1-tpl-npy", default="")
    p.add_argument("--g1-subjects-npy", default="")
    p.add_argument("--g2-tpl-npy", default="")
    p.add_argument("--g2-subjects-npy", default="")
    p.add_argument("--preset", default="ms1m_ijbc")
    p.add_argument("--approx", action="store_true",
                   help="binned approx_max_k gallery selection for the 1:N "
                        "top-k scans (headline numbers stay exact-mode)")
    p.add_argument("--approx-recall", type=float, default=0.0,
                   help="approx_max_k recall_target in (0, 1); implies "
                        "--approx. 0.999 defeats the adversarial "
                        "stride-aliased layout (see eval/identification)")
    p.set_defaults(fn=cmd_eval_ijbc)

    p = sub.add_parser("import-torch")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--preset", default="casia_arcface")
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("extract")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--list", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ conv path "
                        "(models/quant.py), calibrated on this run's inputs")
    p.add_argument("--quantize-bank", action="store_true",
                   help="write an int8 .npz embedding bank (eval/bank.py: "
                        "4x smaller, s8 MXU scoring) instead of float .npy")
    p.add_argument("--preset", default="casia_arcface")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("export")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--flip-tta", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="export the int8 PTQ backbone (noise-calibrated "
                        "unless the artifact is re-exported with real data)")
    _add_sr_args(p, "bake a frozen hallucinator in front of the backbone")
    p.add_argument("--preset", default="casia_arcface")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("headline")
    p.add_argument("--out", default="/tmp/crfr_headline",
                   help="stage checkpoints + headline.json land here")
    p.add_argument("--seeds", type=int, default=1,
                   help=">1: run that many full replicates (seed, "
                        "seed+1000, ...) and aggregate mean±std per cell "
                        "+ per-seed ordering into headline_seeds.json")
    p.add_argument("--probe-sizes", default="16,8",
                   help="comma-separated LR probe sizes (must divide "
                        "data size; a (SR-GAN, student pair) trains per "
                        "size)")
    p.set_defaults(fn=cmd_headline)

    p = sub.add_parser("pack")
    p.add_argument("--root", default="",
                   help="identity-folder image tree to pack")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--from-rec", default="",
                   help="convert an MXNet .rec (insightface MS1M layout)")
    p.add_argument("--idx", default="",
                   help=".idx path (default: alongside --from-rec)")
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("match")
    p.add_argument("--gallery-npy", required=True,
                   help="gallery embedding bank: float .npy or int8 .npz "
                        "(from `crfr extract [--quantize-bank]`)")
    p.add_argument("--gallery-labels-npy", default="",
                   help="gallery labels .npy (default: row index)")
    p.add_argument("--probe-npy", default="",
                   help="probe embeddings .npy (skips --ckpt)")
    p.add_argument("--ckpt", default="", help="embed probe images instead")
    p.add_argument("--list", default="", help="probe image list file")
    p.add_argument("--root", default="")
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--int8", action="store_true",
                   help="embed probes through the int8 PTQ path")
    p.add_argument("--approx", action="store_true",
                   help="binned approx_max_k gallery selection — 1.9× "
                        "faster scans at recall@10 ≈ 0.998 (serving)")
    p.add_argument("--approx-recall", type=float, default=0.0,
                   help="approx_max_k recall_target in (0, 1); implies "
                        "--approx. 0.999 defeats the adversarial "
                        "stride-aliased layout (see eval/identification)")
    _add_sr_args(p, "route probe images through the hallucinator")
    p.add_argument("--preset", default="casia_arcface")
    p.set_defaults(fn=cmd_match)

    p = sub.add_parser("serve-http")
    p.add_argument("--artifact", required=True,
                   help="AOT artifact from `crfr export`")
    p.add_argument("--gallery-npz", default="",
                   help="int8 bank (`crfr extract --quantize-bank`) to "
                        "enable /match")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--window-ms", type=float, default=2.0,
                   help="request-coalescing window")
    p.add_argument("--mutable-gallery", action="store_true",
                   help="serve the bank as a capacity-padded ServingBank: "
                        "online POST /enroll and /remove (tombstones), "
                        "GET /gallery snapshot — no per-mutation scan "
                        "recompiles")
    p.add_argument("--gallery-slab", type=int, default=0,
                   help="capacity rounding slab for --mutable-gallery "
                        "(default ServingBank.SLAB=65536)")
    p.set_defaults(fn=cmd_serve_http)

    p = sub.add_parser("bench")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--int8", action="store_true",
                   help="bench the int8 PTQ embed path instead of bf16")
    p.set_defaults(fn=cmd_bench)

    args, extra = ap.parse_known_args(argv)
    # the effective argv, for process-recycling re-exec (cmd_train)
    args._argv = list(sys.argv[1:] if argv is None else argv)
    return args.fn(args, extra)


if __name__ == "__main__":
    raise SystemExit(main())
