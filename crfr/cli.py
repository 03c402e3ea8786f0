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


def _split_overrides(extra):
    return [a for a in extra if "=" in a and not a.startswith("-")]


def _load_cfg(args, extra):
    from crfr.configs import get_config
    return get_config(args.preset, _split_overrides(extra))


def _source_or_synthetic(cfg, path: str | None):
    if path:
        from crfr.data.records import open_source
        return open_source(path), None
    from crfr.data.synthetic import SyntheticFaces
    data = SyntheticFaces(num_classes=cfg.data.num_classes,
                          image_size=cfg.data.image_size)
    return None, data


def cmd_train(args, extra) -> int:
    import jax
    from crfr.data.pipeline import PipelineCfg, train_batches
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer
    from crfr.utils.logging import MetricsWriter

    cfg = _load_cfg(args, extra)
    metrics = MetricsWriter(os.path.join(cfg.train.checkpoint_dir,
                                         "metrics.jsonl"))
    tr = Trainer(cfg, steps_per_epoch=args.steps_per_epoch, metrics=metrics)
    ck = Checkpointer(cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints)
    if args.resume and ck.latest_step() is not None:
        tr.state = ck.restore(tr.state)
        print(f"resumed from step {ck.latest_step()}", file=sys.stderr)

    source, synth = _source_or_synthetic(cfg, cfg.data.train_records or None)
    start = int(jax.device_get(tr.state["step"]))
    data_state_path = os.path.join(cfg.train.checkpoint_dir,
                                   "data_state.json")
    if source is not None:
        data_state = None
        if args.resume and start and os.path.exists(data_state_path):
            with open(data_state_path) as f:
                saved = json.load(f)
            if saved.get("step") == start:     # exact-match resume only
                data_state = saved["state"]
        batches = train_batches(source, PipelineCfg(
            batch_size=cfg.train.batch_size, seed=cfg.train.seed,
            random_flip=cfg.data.random_flip, num_workers=args.workers),
            start_step=start, state=data_state)
    else:
        batches = synth.batches(cfg.train.batch_size, args.max_steps or 1000,
                                seed=cfg.train.seed)

    def save(step: int, force: bool = False):
        ck.save(step, tr.state, cfg.to_json(), force=force)
        if source is not None:
            with open(data_state_path, "w") as f:
                json.dump({"step": step, "state": batches.get_state()}, f)

    # In-training eval fn compiled ONCE, taking state as an argument —
    # rebuilding a closure per eval would recompile the backbone each time.
    _eval_jit = None

    def in_loop_eval(step: int):
        # reference §3.1 "every N: evaluate(lfw)" — .bin verification set
        nonlocal _eval_jit
        if not args.eval_bin:
            return
        import jax as _jax
        import jax.numpy as jnp
        from flax import nnx

        from crfr.data.bins import evaluate_bin
        from crfr.eval.extract import make_extract_fn

        if _eval_jit is None:
            @_jax.jit
            def _embed(params, bstats, rngs, x):
                model = nnx.merge(tr.graphdef, params, bstats, rngs)
                fn = make_extract_fn(
                    lambda y: model.backbone(y, train=False),
                    degrade_to=cfg.data.eval_degrade_size,
                    resize_mode=cfg.data.resize_mode,
                    flip_fusion=cfg.eval.flip_fusion,
                    image_size=cfg.model.input_size)
                return fn(x)
            _eval_jit = _embed

        def extract(x):
            return _eval_jit(tr.state["params"], tr.state["batch_stats"],
                             tr.state["rng_state"], x)

        res = evaluate_bin(args.eval_bin, extract, cfg.eval.batch_size,
                           cfg.model.input_size, cfg.eval.n_folds)
        metrics.write(step, eval_accuracy=res.accuracy_mean, eval_eer=res.eer)

    for i, (imgs, labels) in enumerate(batches):
        if args.max_steps and i + start >= args.max_steps:
            break
        tr.train_step(imgs, labels)
        step = int(jax.device_get(tr.state["step"]))
        if step % cfg.train.checkpoint_every_steps == 0:
            save(step)
        if step % cfg.train.eval_every_steps == 0:
            in_loop_eval(step)
    step = int(jax.device_get(tr.state["step"]))
    if ck.latest_step() != step:      # last loop save may already cover it
        save(step, force=True)
    ck.close()
    print(json.dumps({"final_step": step}))
    return 0


def cmd_train_sr(args, extra) -> int:
    from crfr.train.sr_loop import SRTrainer
    from crfr.utils.logging import MetricsWriter

    from crfr.train.checkpoints import Checkpointer

    cfg = _load_cfg(args, extra)
    metrics = MetricsWriter(os.path.join(cfg.train.checkpoint_dir,
                                         "sr_metrics.jsonl"))
    tr = SRTrainer(cfg, scale=args.scale, metrics=metrics)
    ck = Checkpointer(os.path.join(cfg.train.checkpoint_dir, "sr"),
                      keep=cfg.train.keep_checkpoints)
    if args.resume and ck.latest_step() is not None:
        tr.load_state_dict(ck.restore(tr.state_dict()))
        print(f"resumed SR from step {tr.step}", file=sys.stderr)
    source, synth = _source_or_synthetic(cfg, cfg.data.train_records or None)
    if source is not None:
        from crfr.data.pipeline import PipelineCfg, train_batches
        batches = ((imgs, None) for imgs, _ in train_batches(
            source, PipelineCfg(batch_size=cfg.train.batch_size,
                                seed=cfg.train.seed)))
    else:
        batches = synth.batches(cfg.train.batch_size, args.max_steps or 1000)
    m = {}
    start = tr.step
    for i, (imgs, _) in enumerate(batches):
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
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.distill_loop import DistillTrainer, teacher_from_trainer
    from crfr.train.loop import Trainer
    from crfr.utils.logging import MetricsWriter
    from crfr.configs import Config

    cfg = _load_cfg(args, extra)
    if cfg.loss.distill_weight <= 0:
        cfg = cfg.override(**{"loss.distill_weight": args.kd_weight})

    tck = Checkpointer(args.teacher_ckpt, keep=1)
    tcfg_dict = tck.restore_config()
    tcfg = Config.from_dict(tcfg_dict) if tcfg_dict else cfg
    teacher_tr = Trainer(tcfg, steps_per_epoch=1000)
    teacher_tr.state = tck.restore(teacher_tr.state)

    metrics = MetricsWriter(os.path.join(cfg.train.checkpoint_dir,
                                         "distill_metrics.jsonl"))
    st = DistillTrainer(cfg, teacher_from_trainer(teacher_tr),
                        metrics=metrics)
    sck = Checkpointer(os.path.join(cfg.train.checkpoint_dir, "student"),
                       keep=cfg.train.keep_checkpoints)
    if args.resume and sck.latest_step() is not None:
        st.load_state_dict(sck.restore(st.state_dict()))
        print(f"resumed student from step {st.step}", file=sys.stderr)
    source, synth = _source_or_synthetic(cfg, cfg.data.train_records or None)
    if source is not None:
        from crfr.data.pipeline import PipelineCfg, train_batches
        batches = train_batches(source, PipelineCfg(
            batch_size=cfg.train.batch_size, seed=cfg.train.seed))
    else:
        batches = synth.batches(cfg.train.batch_size, args.max_steps or 1000)
    m = {}
    start = st.step
    for i, (imgs, labels) in enumerate(batches):
        if args.max_steps and i + start >= args.max_steps:
            break
        m = st.train_step(imgs, labels)
        if st.step % cfg.train.checkpoint_every_steps == 0:
            sck.save(st.step, st.state_dict(), cfg.to_json())
    if st.step and sck.latest_step() != st.step:
        sck.save(st.step, st.state_dict(), cfg.to_json(), force=True)
    sck.close()
    print(json.dumps({k: float(jax.device_get(v)) for k, v in m.items()}
                     | {"steps": st.step}))
    return 0


def _embed_fn_from_ckpt(args, extra):
    """Rebuild a Trainer from config+checkpoint → jitted raw-pixel embed."""
    import jax
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer
    from crfr.configs import Config

    ck = Checkpointer(args.ckpt, keep=1)
    cfg_dict = ck.restore_config()
    if cfg_dict is not None:
        cfg = Config.from_dict(cfg_dict)
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
    backbone = lambda x: tr.model.backbone(x, train=False)  # noqa: E731
    kw = dict(resize_mode=cfg.data.resize_mode,
              flip_fusion=cfg.eval.flip_fusion,
              image_size=cfg.model.input_size)
    fn_hr = make_extract_fn(backbone, degrade_to=None, **kw)
    fn_lr = make_extract_fn(backbone, degrade_to=degrade, **kw)
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
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         flip_fusion=cfg.eval.flip_fusion)
    g = extract_embeddings(split.gallery_paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    p = extract_embeddings(split.probe_paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    res = closed_set_identification(p, g, split.probe_labels,
                                    split.gallery_labels)
    print(json.dumps({"rank1": res.rank1, "cmc": res.cmc.tolist()}))
    return 0


def cmd_eval_openset(args, extra) -> int:
    from crfr.data.datasets import open_set_split
    from crfr.eval.extract import extract_embeddings, make_extract_fn
    from crfr.eval.identification import open_set_identification

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    split = open_set_split(args.gallery_list, args.mated_list,
                           args.unmated_list, args.root)
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         flip_fusion=cfg.eval.flip_fusion)
    g = extract_embeddings(split.gallery_paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    p = extract_embeddings(split.probe_paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    res = open_set_identification(p, g, split.probe_labels,
                                  split.gallery_labels, split.probe_mated,
                                  cfg.eval.fpir_targets)
    print(json.dumps({"rank1": res.rank1, "tpir_at_fpir": res.tpir_at_fpir}))
    return 0


def cmd_eval_bin(args, extra) -> int:
    """insightface .bin verification set (lfw.bin / cfp_fp.bin / agedb.bin)."""
    from crfr.data.bins import evaluate_bin
    from crfr.eval.extract import make_extract_fn

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         degrade_to=args.degrade or cfg.data.eval_degrade_size,
                         resize_mode=cfg.data.resize_mode,
                         flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size)
    res = evaluate_bin(args.bin, fn, cfg.eval.batch_size,
                       cfg.model.input_size, cfg.eval.n_folds,
                       cfg.eval.far_targets)
    print(json.dumps({"accuracy": res.accuracy_mean, "std": res.accuracy_std,
                      "eer": res.eer, "tar_at_far": res.tar_at_far}))
    return 0


def cmd_eval_ijbc(args, extra) -> int:
    """IJB-C: --meta CSV 'path template_id media_id subject_id' per line;
    --pairs 't1 t2 label' per line for 1:1; --gallery-templates /
    --probe-templates subject-id lists for 1:N (optional)."""
    import numpy as np

    from crfr.eval.extract import extract_embeddings, make_extract_fn
    from crfr.eval.ijbc import ijbc_11

    tr, cfg = _embed_fn_from_ckpt(args, extra)
    paths, tids, mids, sids = [], [], [], []
    with open(args.meta) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) < 4:
                continue
            paths.append(os.path.join(args.root, parts[0]))
            tids.append(int(parts[1]))
            mids.append(int(parts[2]))
            sids.append(int(parts[3]))
    t1, t2, lab = [], [], []
    with open(args.pairs) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) == 3:
                t1.append(int(parts[0]))
                t2.append(int(parts[1]))
                lab.append(int(parts[2]))
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         flip_fusion=cfg.eval.flip_fusion)
    embs = extract_embeddings(paths, fn, cfg.eval.batch_size, cfg.model.input_size)
    res = ijbc_11(embs, np.asarray(tids), np.asarray(mids),
                  np.asarray(t1), np.asarray(t2), np.asarray(lab))
    print(json.dumps({"tar_at_far": res.tar_at_far}))
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
    fn = make_extract_fn(lambda x: tr.model.backbone(x, train=False),
                         degrade_to=args.degrade or None,
                         resize_mode=cfg.data.resize_mode,
                         flip_fusion=cfg.eval.flip_fusion,
                         image_size=cfg.model.input_size)
    embs = extract_embeddings(paths, fn, cfg.eval.batch_size,
                              cfg.model.input_size)
    np.save(args.out, embs)
    if any(l >= 0 for l in labels):
        np.save(args.out.replace(".npy", "") + "_labels.npy",
                np.asarray(labels))
    print(json.dumps({"out": args.out, "count": len(paths),
                      "dim": int(embs.shape[1]) if len(embs) else 0}))
    return 0


def cmd_pack(args, extra) -> int:
    from crfr.data.records import pack_image_folder, write_array_record, write_pack

    writer = write_pack if args.out.endswith(".crfrpack") else write_array_record
    n, c = pack_image_folder(args.root, args.out, size=args.size,
                             writer=writer)
    print(json.dumps({"images": n, "identities": c, "out": args.out}))
    return 0


def cmd_bench(args, extra) -> int:
    from crfr.bench.throughput import run_throughput

    res = run_throughput(batch=args.batch, steps=args.steps)
    print(json.dumps({"imgs_per_sec": res.imgs_per_sec,
                      "per_batch_ms": res.per_batch_ms}))
    return 0


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
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-sr")
    p.add_argument("--preset", default="casia_arcface")
    p.add_argument("--scale", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train_sr)

    p = sub.add_parser("train-distill")
    p.add_argument("--preset", default="casia_arcface")
    p.add_argument("--teacher-ckpt", required=True)
    p.add_argument("--kd-weight", type=float, default=1.0)
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(fn=cmd_train_distill)

    p = sub.add_parser("eval-verification")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--pairs", required=True)
    p.add_argument("--lfw-root", required=True)
    p.add_argument("--preset", default="lfw_ir50_16px")
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--degrade-side", default="second",
                   choices=("first", "second", "both"))
    p.set_defaults(fn=cmd_eval_verification)

    p = sub.add_parser("eval-scface")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--gallery", required=True)
    p.add_argument("--probes", required=True)
    p.add_argument("--distance", type=int, default=1, choices=(1, 2, 3))
    p.add_argument("--preset", default="scface")
    p.set_defaults(fn=cmd_eval_scface)

    p = sub.add_parser("eval-openset")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--gallery-list", required=True)
    p.add_argument("--mated-list", required=True)
    p.add_argument("--unmated-list", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--preset", default="tinyface_survface")
    p.set_defaults(fn=cmd_eval_openset)

    p = sub.add_parser("eval-bin")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--bin", required=True)
    p.add_argument("--degrade", type=int, default=0)
    p.add_argument("--preset", default="lfw_ir50_16px")
    p.set_defaults(fn=cmd_eval_bin)

    p = sub.add_parser("eval-ijbc")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--meta", required=True)
    p.add_argument("--pairs", required=True)
    p.add_argument("--root", default="")
    p.add_argument("--preset", default="ms1m_ijbc")
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
    p.add_argument("--preset", default="casia_arcface")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("pack")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=112)
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("bench")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=30)
    p.set_defaults(fn=cmd_bench)

    args, extra = ap.parse_known_args(argv)
    return args.fn(args, extra)


if __name__ == "__main__":
    raise SystemExit(main())
