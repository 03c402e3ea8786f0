"""The paper's headline experiment as ONE reproducible, config-driven run.

Composes every stage of the reference's titular pipeline (SURVEY.md
§3.1→§3.5; the reference mount is empty, so the SURVEY call stacks are the
contract) into a single deterministic driver:

  1. render identities (crfr/data/render.py) — disjoint train / eval /
     distractor splits from one seeded renderer,
  2. HR teacher: ArcFace Trainer on full-resolution faces,
  3. prior-aided SR-GAN (per probe size): SRTrainer with the frozen
     teacher's identity + perceptual losses,
  4. student + residual KD through the frozen hallucinator:
     DistillTrainer(sr_fn=G),
  5. baseline student: identical DistillTrainer but bicubic-upsampled
     LR input (no G),
  6. cross-resolution eval of three systems at each probe size, all
     matched against the SAME teacher-embedded HR gallery (residual KD
     aligns the student space to the teacher space — that alignment is
     what makes cross-model matching meaningful):
       teacher_lr    — teacher embeds bicubic-upsampled probes,
       student_bic   — KD student on bicubic probes (s + r features),
       student_sr    — KD student on hallucinated probes (s + r).

     Protocols: cross-resolution verification (LR probe vs HR
     reference), SCface-style closed-set identification, and
     TinyFace-style open-set identification with unenrolled distractors.

The paper's claim, asserted by tests/test_headline.py and recorded on the
real chip in BASELINE.md §headline:
  student_sr > student_bic > teacher_lr   (verification acc & rank-1)

Every stage checkpoints under ``out_dir`` and the metrics table is written
as JSON — a user of the reference reproduces the paper's experiment with
one command:  python -m crfr headline --out /tmp/headline
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np

from crfr.configs import Config, DataCfg, EvalCfg, LossCfg, MeshCfg, \
    ModelCfg, TrainCfg


@dataclass(frozen=True)
class HeadlineCfg:
    # data
    ids_train: int = 96
    ids_eval: int = 32
    ids_distract: int = 32
    samples_per_id: int = 48
    image_size: int = 112
    seed: int = 0
    # model/training (defaults sized for the single real chip)
    backbone: str = "ir_18"
    compute_dtype: str = "bfloat16"
    batch_size: int = 64
    teacher_steps: int = 1200
    sr_steps: int = 800
    distill_steps: int = 800
    lr_teacher: float = 0.1
    lr_student: float = 0.05
    # KD weight on RAW-feature L2 (the paper's formulation). Balance it
    # against CE: teacher embeddings carry ‖t‖ ≈ 20, so the raw distance
    # starts near ‖t‖² ≈ 450/example — at λ=16 the KD gradient drowns CE
    # and SGD(0.05)+momentum overshoots the stiff quadratic into NaN
    # (observed at recorded scale, r4). λ=0.05 puts the initial KD term at
    # ≈1.5× CE; with grad clipping both terms descend to convergence
    # (sweep: CE 14.3→0.007, raw ‖(s+r)−t‖² → 18 in 400 steps).
    kd_weight: float = 0.05
    grad_clip: float = 5.0
    probe_sizes: tuple[int, ...] = (16, 8)
    # eval
    n_pairs: int = 256            # per polarity (512 verification pairs)
    probes_per_id: int = 6
    enroll_frac: float = 0.5      # eval ids enrolled for open-set
    eval_batch: int = 64
    # plumbing
    out_dir: str = "/tmp/crfr_headline"
    mesh_data: int = 1
    log_every: int = 200


def _cfg(h: HeadlineCfg, *, num_classes: int, degrade: int | None,
         lr: float, steps: int, distill: float = 0.0,
         name: str = "headline") -> Config:
    """One Config per stage; degrade=None → HR-only training."""
    d = degrade if degrade is not None else h.image_size
    return Config(
        name=name,
        mesh=MeshCfg(data=h.mesh_data, model=1),
        data=DataCfg(image_size=h.image_size, num_classes=num_classes,
                     degrade_min=d, degrade_max=d,
                     per_sample_degrade=False, random_flip=True),
        model=ModelCfg(backbone=h.backbone, compute_dtype=h.compute_dtype,
                       dropout=0.0, input_size=h.image_size),
        loss=LossCfg(scale=32.0, margin=0.3, distill_weight=distill,
                     sr_adv_weight=1e-3, sr_identity_weight=1e-2,
                     sr_prior_weight=1.0, sr_perceptual_weight=1e-2),
        train=TrainCfg(batch_size=h.batch_size, lr=lr,
                       warmup_steps=max(steps // 10, 1), schedule="step",
                       lr_drop_epochs=(), weight_decay=5e-4,
                       grad_clip_norm=h.grad_clip,
                       seed=h.seed, log_every=h.log_every,
                       eval_every_steps=10 ** 9,
                       checkpoint_every_steps=10 ** 9,
                       checkpoint_dir=os.path.join(h.out_dir, name)),
        eval=EvalCfg(n_folds=8),
    )


def _epoch_feed(imgs: np.ndarray, labels: np.ndarray, batch: int,
                steps: int, seed: int):
    """Shuffled epoch iterator over a fixed rendered set, exactly ``steps``
    batches (epochs wrap; remainder batches are dropped like the Grain
    pipeline does — static shapes)."""
    rng = np.random.default_rng(seed)
    n = (len(imgs) // batch) * batch
    done = 0
    while done < steps:
        perm = rng.permutation(len(imgs))[:n]
        for i in range(0, n, batch):
            if done == steps:
                return
            sel = perm[i:i + batch]
            yield imgs[sel].astype(np.float32), labels[sel]
            done += 1


def _embed_arrays(fn, imgs: np.ndarray, batch: int) -> np.ndarray:
    """Fixed-shape chunked embed (pad tail) — one compile per batch size."""
    out = []
    for i in range(0, len(imgs), batch):
        chunk = imgs[i:i + batch].astype(np.float32)
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    np.float32)])
        out.append(np.asarray(fn(chunk))[:batch - pad if pad else batch])
    return np.concatenate(out)


def _train_teacher(h: HeadlineCfg, imgs, labels, n_classes):
    from crfr.train.checkpoints import Checkpointer
    from crfr.train.loop import Trainer

    cfg = _cfg(h, num_classes=n_classes, degrade=None, lr=h.lr_teacher,
               steps=h.teacher_steps, name="teacher")
    tr = Trainer(cfg, steps_per_epoch=max(len(imgs) // h.batch_size, 1))
    m = {}
    for x, y in _epoch_feed(imgs, labels, h.batch_size, h.teacher_steps,
                            h.seed + 1):
        m = tr.train_step(x, y)
    ck = Checkpointer(cfg.train.checkpoint_dir, keep=1)
    ck.save(h.teacher_steps, tr.state, cfg.to_json(), force=True)
    ck.close()
    return tr, float(np.asarray(m.get("loss", np.nan)))


def _train_sr(h: HeadlineCfg, teacher_tr, imgs, probe: int):
    from crfr.train.distill_loop import teacher_from_trainer
    from crfr.train.sr_loop import SRTrainer, perceptual_from_trainer

    scale = h.image_size // probe
    cfg = _cfg(h, num_classes=h.ids_train, degrade=probe, lr=1e-4,
               steps=h.sr_steps, name=f"sr{probe}")
    tr = SRTrainer(cfg, scale=scale,
                   teacher_fn=teacher_from_trainer(teacher_tr),
                   perceptual_fn=perceptual_from_trainer(teacher_tr),
                   schedule="cosine", total_steps=h.sr_steps,
                   warmup_steps=max(h.sr_steps // 20, 1),
                   r1_gamma=1.0)
    m = {}
    for x, _ in _epoch_feed(imgs, np.zeros(len(imgs), np.int32),
                            h.batch_size, h.sr_steps, h.seed + 2):
        m = tr.train_step(x)
    return tr, {k: float(np.asarray(v)) for k, v in m.items()}


def _train_student(h: HeadlineCfg, teacher_tr, imgs, labels, n_classes,
                   probe: int, sr_fn=None):
    from crfr.train.distill_loop import DistillTrainer, teacher_from_trainer

    scale = h.image_size // probe
    name = f"student{'_sr' if sr_fn is not None else '_bic'}{probe}"
    cfg = _cfg(h, num_classes=n_classes, degrade=probe, lr=h.lr_student,
               steps=h.distill_steps, distill=h.kd_weight, name=name)
    tr = DistillTrainer(cfg, teacher_from_trainer(teacher_tr),
                        steps_per_epoch=max(len(imgs) // h.batch_size, 1),
                        sr_fn=sr_fn, sr_scale=scale)
    m = {}
    for x, y in _epoch_feed(imgs, labels, h.batch_size, h.distill_steps,
                            h.seed + 3):
        m = tr.train_step(x, y)
    return tr, float(np.asarray(m.get("loss", np.nan)))


def _probe_embedders(h: HeadlineCfg, teacher_tr, students: dict,
                     sr_apply, probe: int):
    """LR-probe embedding fn per system + the shared teacher HR embedder."""
    from flax import nnx

    from crfr.eval.extract import make_extract_fn

    hr = make_extract_fn(teacher_tr.backbone_apply, degrade_to=None,
                         image_size=h.image_size, flip=False,
                         state_fn=teacher_tr.embed_state)

    def _student_apply(dtr):
        graphdef = dtr.graphdef

        def f(state, x):
            student = nnx.merge(graphdef, state)
            s = student.backbone(x, train=False)
            return s + student.residual(s, train=False)

        return f

    sys_lr = {
        "teacher_lr": make_extract_fn(
            teacher_tr.backbone_apply, degrade_to=probe,
            image_size=h.image_size, flip=False,
            state_fn=teacher_tr.embed_state),
        "student_bic": make_extract_fn(
            _student_apply(students["student_bic"]), degrade_to=probe,
            image_size=h.image_size, flip=False,
            state_fn=lambda: students["student_bic"].state),
        "student_sr": make_extract_fn(
            _student_apply(students["student_sr"]), degrade_to=probe,
            image_size=h.image_size, flip=False,
            state_fn=lambda: students["student_sr"].state,
            sr_apply=sr_apply),
    }
    return hr, sys_lr


def _evaluate_probe(h: HeadlineCfg, renderer, hr_embed, sys_lr,
                    eval_range, distract_range, rng) -> dict:
    from crfr.eval.identification import closed_set_identification, \
        open_set_identification
    from crfr.eval.verification import evaluate_verification

    lo, hi = eval_range
    n_eval = hi - lo

    # ---- verification pairs: member 1 is the LR probe, member 2 the HR
    # reference (embedded by the teacher for every system)
    p1, p2, issame = renderer.eval_pairs(rng, h.n_pairs, id_range=eval_range)
    e_hr = _embed_arrays(hr_embed, p2, h.eval_batch)

    # ---- identification sets: 1 HR mugshot per eval id (teacher gallery),
    # probes_per_id LR probes per eval id + per distractor id
    gal_ids = np.arange(lo, hi)
    gal_imgs = renderer.sample_for_ids(rng, gal_ids)
    g_emb = _embed_arrays(hr_embed, gal_imgs, h.eval_batch)

    probe_ids = np.repeat(np.arange(lo, hi), h.probes_per_id)
    probe_imgs = renderer.sample_for_ids(rng, probe_ids)

    dlo, dhi = distract_range
    dist_ids = np.repeat(np.arange(dlo, dhi), h.probes_per_id)
    dist_imgs = renderer.sample_for_ids(rng, dist_ids)

    # open-set enrollment: first enroll_n eval ids stay in the gallery;
    # probes of unenrolled eval ids + distractors are nonmated
    enroll_n = max(int(n_eval * h.enroll_frac), 1)
    os_gal = g_emb[:enroll_n]
    os_gal_ids = gal_ids[:enroll_n]

    out = {}
    for name, lr_embed in sys_lr.items():
        e_lr = _embed_arrays(lr_embed, p1, h.eval_batch)
        ver = evaluate_verification(e_lr, e_hr, issame,
                                    n_folds=8, far_targets=(1e-2,))
        pe = _embed_arrays(lr_embed, probe_imgs, h.eval_batch)
        de = _embed_arrays(lr_embed, dist_imgs, h.eval_batch)
        closed = closed_set_identification(pe, g_emb, probe_ids, gal_ids,
                                           max_rank=5)
        os_pe = np.concatenate([pe, de])
        os_ids = np.concatenate([probe_ids, dist_ids])
        mated = np.isin(os_ids, os_gal_ids)
        opn = open_set_identification(os_pe, os_gal, os_ids, os_gal_ids,
                                      mated, fpir_targets=(1e-1,),
                                      max_rank=5)
        out[name] = {
            "verification_acc": float(ver.accuracy_mean),
            "rank1": float(closed.rank1),
            "cmc5": float(np.asarray(closed.cmc)[-1]),
            "tpir_at_fpir0.1": float(opn.tpir_at_fpir[0.1]),
        }
    return out


def run_headline(h: HeadlineCfg) -> dict:
    """Run every stage; returns the full metrics dict (also written to
    ``out_dir/headline.json``)."""
    from crfr.data.render import RenderedIdentities

    os.makedirs(h.out_dir, exist_ok=True)
    t0 = time.time()
    n_ids = h.ids_train + h.ids_eval + h.ids_distract
    renderer = RenderedIdentities(n_ids, image_size=h.image_size,
                                  seed=h.seed)
    eval_range = (h.ids_train, h.ids_train + h.ids_eval)
    distract_range = (h.ids_train + h.ids_eval, n_ids)

    # ---- stage 1: render the fixed training set (uint8 in RAM)
    rng = np.random.default_rng(h.seed + 10)
    train_ids = np.tile(np.arange(h.ids_train), h.samples_per_id)
    imgs = np.empty((len(train_ids), h.image_size, h.image_size, 3),
                    np.uint8)
    for i in range(0, len(train_ids), 256):
        imgs[i:i + 256] = renderer.sample_for_ids(
            rng, train_ids[i:i + 256]).astype(np.uint8)
    labels = train_ids.astype(np.int32)
    stages = {"render_s": round(time.time() - t0, 1),
              "n_train_imgs": len(imgs)}

    # ---- stage 2: HR teacher
    t1 = time.time()
    teacher_tr, t_loss = _train_teacher(h, imgs, labels, h.ids_train)
    stages["teacher"] = {"loss": t_loss, "s": round(time.time() - t1, 1)}

    results = {}
    for probe in h.probe_sizes:
        # ---- stage 3: prior-aided SR-GAN at this probe size
        t1 = time.time()
        sr_tr, sr_m = _train_sr(h, teacher_tr, imgs, probe)
        sr_m["s"] = round(time.time() - t1, 1)
        stages[f"sr{probe}"] = sr_m
        sr_apply = sr_tr.sr_apply(ema=True)

        # ---- stages 4+5: KD students (hallucinated vs bicubic input)
        t1 = time.time()
        st_sr, l_sr = _train_student(h, teacher_tr, imgs, labels,
                                     h.ids_train, probe, sr_fn=sr_apply)
        st_bic, l_bic = _train_student(h, teacher_tr, imgs, labels,
                                       h.ids_train, probe, sr_fn=None)
        stages[f"students{probe}"] = {"loss_sr": l_sr, "loss_bic": l_bic,
                                      "s": round(time.time() - t1, 1)}

        # ---- stage 6: cross-resolution eval
        t1 = time.time()
        hr_embed, sys_lr = _probe_embedders(
            h, teacher_tr, {"student_sr": st_sr, "student_bic": st_bic},
            sr_apply, probe)
        results[str(probe)] = _evaluate_probe(
            h, renderer, hr_embed, sys_lr, eval_range, distract_range,
            np.random.default_rng(h.seed + 20 + probe))
        results[str(probe)]["eval_s"] = round(time.time() - t1, 1)

    table = {"cfg": dataclasses.asdict(h), "stages": stages,
             "results": results, "total_s": round(time.time() - t0, 1)}
    with open(os.path.join(h.out_dir, "headline.json"), "w") as f:
        json.dump(table, f, indent=1)
    return table


def ordering_holds(table: dict, probe: int,
                   metric: str = "verification_acc") -> bool:
    """The paper's claim at one probe size: student_sr ≥ student_bic ≥
    teacher_lr with a strict gap end-to-end."""
    r = table["results"][str(probe)]
    a, b, c = (r["student_sr"][metric], r["student_bic"][metric],
               r["teacher_lr"][metric])
    return a >= b >= c and a > c
