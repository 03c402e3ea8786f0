"""Student + residual-KD training driver (SURVEY.md §3.5, rebuilt TPU-first).

One jitted step:

  HR batch → teacher embedding t = T(hr)            (frozen, stop-grad)
  HR batch → LR student input, one of:
     bicubic degrade (random or fixed low, down→up matmul operators), or
     **hallucinated**: bicubic↓ to the SR scale → frozen Hallucinator G(lr)
     (``sr_fn`` — the paper's full pipeline, §3.2→§3.5: prior-aided face
     hallucination FOR cross-resolution recognition)
  student: s = S(input);  r = R(s)
  L = CE(ArcFace(s, y)) + λ·‖(s + r) − t‖²

All forwards (teacher, G, student) live in the SAME XLA program, so the
whole cascade runs on-chip with zero host round-trips (the reference pays
separate network passes — §3.5 "second network forward per step").

The teacher is any pure callable (normalized pixels → embeddings); use
``teacher_from_trainer``/``teacher_from_state`` to freeze a trained model.
The SR plug comes from ``crfr.train.sr_loop.sr_apply_from_state`` /
``load_sr_apply`` / ``SRTrainer.sr_apply``. Alternatively pass
``sr_module=(g_graphdef, g_state)`` to fine-tune the hallucinator JOINTLY
with the student (recognition-driven G refinement): G's params get their
own Adam at ``sr_lr``, gradients flow from CE+KD through the student into
G, and ``sr_pixel_weight·‖G(lr)−hr‖₁`` anchors G to the reconstruction
task so identity gradients sharpen rather than collapse it.

The CE over the student head scales like the main Trainer's (dense /
streaming flash-softmax / PartialFC class-sharded, cfg.loss.ce_impl) so
distillation runs at MS1M class counts without materializing (B, C).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from jax.sharding import Mesh

from crfr.configs import Config
from crfr.losses.arcface import MarginHead, sharded_margin_ce
from crfr.losses.distill import residual_kd_loss
from crfr.models.irse import build_backbone
from crfr.models.residual import ResidualBranch
from crfr.ops.bicubic import degrade_matrix, resize_matrix
from crfr.ops.normalize import normalize
from crfr.parallel.mesh import (batch_sharding, class_sharding, host_put,
                                make_mesh, maybe_shard_batch,
                                pad_to_multiple, replicated)
from crfr.train.loop import lr_schedule, make_sgd_tx
from crfr.utils.logging import MetricsWriter


def teacher_from_state(graphdef, *states) -> Callable:
    """Freeze a split (graphdef, *states) backbone into a pure embed
    callable (expects normalized pixels)."""

    def f(x):
        model = nnx.merge(graphdef, *states)
        backbone = getattr(model, "backbone", model)
        return jax.lax.stop_gradient(backbone(x, train=False))

    return f


def teacher_from_trainer(trainer) -> Callable:
    return teacher_from_state(trainer.graphdef,
                              trainer.state["params"],
                              trainer.state["batch_stats"],
                              trainer.state["rng_state"])


class StudentModel(nnx.Module):
    def __init__(self, cfg: Config, *, rngs: nnx.Rngs):
        mc, lc = cfg.model, cfg.loss
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(mc.backbone,
                                       embedding_dim=mc.embedding_dim,
                                       dropout=mc.dropout,
                                       input_size=mc.input_size,
                                       remat=getattr(mc, "remat", False),
                                       rngs=rngs, dtype=dtype)
        self.residual = ResidualBranch(mc.embedding_dim, rngs=rngs)
        # Class axis padded to a mesh-divisible size; ghost classes masked
        # out of every CE variant via num_valid (as in loop.FaceTrainModel).
        c_pad = pad_to_multiple(cfg.data.num_classes, cfg.mesh.model)
        self.head = MarginHead(mc.embedding_dim, c_pad,
                               margin_type=lc.head, s=lc.scale, m=lc.margin,
                               easy_margin=lc.easy_margin,
                               num_valid=(cfg.data.num_classes
                                          if c_pad != cfg.data.num_classes
                                          else None), rngs=rngs)


class DistillTrainer:
    def __init__(self, cfg: Config, teacher_fn: Callable,
                 mesh: Mesh | None = None, steps_per_epoch: int = 1000,
                 metrics: MetricsWriter | None = None,
                 kd_normalize: bool = False,
                 sr_fn: Callable | None = None, sr_scale: int = 8,
                 sr_module: tuple | None = None, sr_lr: float = 1e-5,
                 sr_pixel_weight: float = 0.3):
        """kd_normalize=True computes the KD distance on L2-normalized
        embeddings — scale-invariant, useful when the teacher's feature-BN
        statistics are not fully converged (raw-feature L2 follows the
        paper's formulation and is the default).

        ``sr_fn`` (normalized LR → normalized SR pixels, pure/jittable —
        see sr_loop.sr_apply_from_state) switches the student input from
        bicubic-degraded to HALLUCINATED faces: hr → bicubic↓ by
        ``sr_scale`` → G(lr) → student. G runs frozen inside the same
        jitted step.

        ``sr_module=(g_graphdef, g_state)`` (e.g. from a restored
        ``SRTrainer``) instead makes G TRAINABLE: joint fine-tuning at
        ``sr_lr`` with an L1 pixel anchor of weight ``sr_pixel_weight``
        (docstring at module top). Mutually exclusive with ``sr_fn``."""
        assert cfg.loss.distill_weight > 0, "set loss.distill_weight > 0"
        self.kd_normalize = kd_normalize
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.metrics = metrics or MetricsWriter(stdout=False)

        student = StudentModel(cfg, rngs=nnx.Rngs(cfg.train.seed + 1))
        self.graphdef, state = nnx.split(student)
        rep = replicated(self.mesh)
        cls = class_sharding(self.mesh)

        def place(path, x):
            s = "/".join(str(getattr(p, "name", getattr(p, "key", p)))
                         for p in path)
            if "head" in s and "weight" in s and cfg.mesh.model > 1:
                return host_put(x, cls)
            return host_put(x, rep)

        self.state = jax.tree_util.tree_map_with_path(place, state)

        self.schedule = lr_schedule(cfg, steps_per_epoch)
        # same optimizer chain as the main Trainer (masked WD + grad clip):
        # student training must regularize exactly like teacher training
        self.tx = make_sgd_tx(cfg, nnx.state(student, nnx.Param),
                              self.schedule)
        opt_state = jax.tree_util.tree_map(
            lambda x: host_put(x, rep),
            self.tx.init(nnx.state(student, nnx.Param)))
        if cfg.mesh.model > 1:
            # momentum buffers of the sharded head W follow W's sharding
            wshape = student.head.weight.value.shape
            opt_state = jax.tree_util.tree_map(
                lambda x: host_put(x, cls)
                if hasattr(x, "shape") and tuple(x.shape) == tuple(wshape)
                else x, opt_state)
        self.opt_state = opt_state
        self.step = 0

        # CE implementation — same auto rules as train.loop.Trainer.
        impl = cfg.loss.ce_impl
        if impl == "auto":
            if cfg.mesh.model > 1:
                impl = "sharded"
            elif cfg.data.num_classes > cfg.loss.ce_streaming_threshold:
                impl = "streaming"
            else:
                impl = "dense"
        c_pad = pad_to_multiple(cfg.data.num_classes, cfg.mesh.model)
        n_valid = cfg.data.num_classes if c_pad != cfg.data.num_classes else None
        if impl == "sharded":
            assert cfg.mesh.model > 1, "sharded CE needs mesh.model > 1"
            self._sharded_ce = sharded_margin_ce(
                self.mesh, margin_type=cfg.loss.head, s=cfg.loss.scale,
                m=cfg.loss.margin, easy_margin=cfg.loss.easy_margin,
                num_valid=n_valid)
        else:
            self._sharded_ce = None
        self._ce_impl = impl

        dc = cfg.data
        self.sr_scale = sr_scale
        assert sr_fn is None or sr_module is None, \
            "sr_fn (frozen G) and sr_module (trainable G) are exclusive"
        if sr_fn is not None or sr_module is not None:
            assert dc.image_size % sr_scale == 0, (dc.image_size, sr_scale)
            # one-way bicubic ↓ operator (f32); G provides the ↑ path
            self._table = host_put(jnp.asarray(resize_matrix(
                dc.image_size, dc.image_size // sr_scale, dc.resize_mode)),
                rep)
            self._n_lows = 0
        else:
            lows = list(range(dc.degrade_min,
                              min(dc.degrade_max, dc.image_size) + 1))
            table = np.stack([degrade_matrix(dc.image_size, l, dc.resize_mode)
                              for l in lows])
            self._table = host_put(jnp.asarray(table), rep)
            self._n_lows = len(lows)

        if sr_module is not None:
            self.g_graphdef, g_state = sr_module
            self.g_state = jax.tree_util.tree_map(
                lambda x: host_put(jnp.asarray(x), rep), g_state)
            self.g_tx = optax.adam(sr_lr, b1=0.9, b2=0.99)
            gen = nnx.merge(self.g_graphdef, self.g_state)
            self.g_opt = jax.tree_util.tree_map(
                lambda x: host_put(x, rep),
                self.g_tx.init(nnx.state(gen, nnx.Param)))
            self.sr_pixel_weight = sr_pixel_weight
            self._step_fn = self._build_joint_step(teacher_fn)
        else:
            self.g_state = None
            self._step_fn = self._build_step(teacher_fn, sr_fn)

    def _build_step(self, teacher_fn, sr_fn=None):
        cfg = self.cfg
        graphdef = self.graphdef
        table, n_lows = self._table, self._n_lows
        lam = cfg.loss.distill_weight
        kd_norm = self.kd_normalize
        tx = self.tx
        sharded_ce = self._sharded_ce
        ce_impl = self._ce_impl

        @partial(jax.jit, donate_argnums=(0, 1))
        def step_fn(state, opt_state, step, images, labels):
            key = jax.random.fold_in(jax.random.key(cfg.train.seed + 7), step)
            student = nnx.merge(graphdef, state)
            x_hr = normalize(images.astype(jnp.float32))
            t_emb = teacher_fn(x_hr)                       # frozen teacher
            if sr_fn is not None:
                # hallucination path: bicubic↓ (normalized space — the
                # operator is linear) → frozen G ↑ (§3.2→§3.5 join)
                lr = jnp.einsum("oi,bijc,pj->bopc", table, x_hr, table,
                                preferred_element_type=jnp.float32)
                x_in = sr_fn(lr)
            else:
                xf = images.astype(jnp.float32)
                if cfg.data.per_sample_degrade:
                    idx = jax.random.randint(key, (xf.shape[0],), 0, n_lows)
                    w = table[idx]
                    x_lr = jnp.einsum("boi,bijc,bpj->bopc", w, xf, w,
                                      preferred_element_type=jnp.float32)
                else:
                    idx = jax.random.randint(key, (), 0, n_lows)
                    w = table[idx]
                    x_lr = jnp.einsum("oi,bijc,pj->bopc", w, xf, w,
                                      preferred_element_type=jnp.float32)
                x_in = normalize(x_lr)

            def loss_fn(student):
                s = student.backbone(x_in, train=True)
                r = student.residual(s, train=True)
                if sharded_ce is not None:
                    ce = sharded_ce(s, labels, student.head.weight.value)
                elif ce_impl == "streaming":
                    from crfr.losses.arcface import streaming_margin_ce
                    ce = streaming_margin_ce(
                        s, student.head.weight.value, labels,
                        margin_type=cfg.loss.head, s=cfg.loss.scale,
                        m=cfg.loss.margin, easy_margin=cfg.loss.easy_margin,
                        block=cfg.loss.ce_block,
                        num_valid=student.head.num_valid)
                else:
                    ce = student.head.loss(s, labels)
                kd = residual_kd_loss(s, r, t_emb, weight=lam,
                                      normalize=kd_norm)
                return ce + kd, (ce, kd)

            (loss, (ce, kd)), grads = nnx.value_and_grad(
                loss_fn, has_aux=True)(student)
            params = nnx.state(student, nnx.Param)
            updates, opt_state = tx.update(grads, opt_state, params)
            nnx.update(student, jax.tree_util.tree_map(jnp.add, params, updates))
            _, state = nnx.split(student)
            return state, opt_state, {"loss": loss, "ce": ce, "kd": kd}

        return step_fn

    def _build_joint_step(self, teacher_fn):
        """Student + trainable-G step: grads of CE + KD + pixel-anchor flow
        into BOTH modules; separate optimizers (SGD student / Adam G)."""
        cfg = self.cfg
        graphdef, g_graphdef = self.graphdef, self.g_graphdef
        table = self._table
        lam = cfg.loss.distill_weight
        kd_norm = self.kd_normalize
        tx, g_tx = self.tx, self.g_tx
        w_px = self.sr_pixel_weight
        sharded_ce = self._sharded_ce
        ce_impl = self._ce_impl

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def step_fn(state, opt_state, g_state, g_opt, step, images, labels):
            del step
            student = nnx.merge(graphdef, state)
            gen = nnx.merge(g_graphdef, g_state)
            x_hr = normalize(images.astype(jnp.float32))
            t_emb = teacher_fn(x_hr)
            lr = jnp.einsum("oi,bijc,pj->bopc", table, x_hr, table,
                            preferred_element_type=jnp.float32)

            def loss_fn(student, gen):
                sr, _, _ = gen(lr, train=True)
                s = student.backbone(sr, train=True)
                r = student.residual(s, train=True)
                if sharded_ce is not None:
                    ce = sharded_ce(s, labels, student.head.weight.value)
                elif ce_impl == "streaming":
                    from crfr.losses.arcface import streaming_margin_ce
                    ce = streaming_margin_ce(
                        s, student.head.weight.value, labels,
                        margin_type=cfg.loss.head, s=cfg.loss.scale,
                        m=cfg.loss.margin, easy_margin=cfg.loss.easy_margin,
                        block=cfg.loss.ce_block,
                        num_valid=student.head.num_valid)
                else:
                    ce = student.head.loss(s, labels)
                kd = residual_kd_loss(s, r, t_emb, weight=lam,
                                      normalize=kd_norm)
                from crfr.losses.gan import pixel_loss
                px = w_px * pixel_loss(sr, x_hr)
                return ce + kd + px, (ce, kd, px)

            (loss, (ce, kd, px)), (grads, g_grads) = nnx.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(student, gen)

            params = nnx.state(student, nnx.Param)
            updates, opt_state = tx.update(grads, opt_state, params)
            nnx.update(student,
                       jax.tree_util.tree_map(jnp.add, params, updates))
            _, state = nnx.split(student)

            g_params = nnx.state(gen, nnx.Param)
            g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
            nnx.update(gen,
                       jax.tree_util.tree_map(jnp.add, g_params, g_updates))
            _, g_state = nnx.split(gen)
            return state, opt_state, g_state, g_opt, {
                "loss": loss, "ce": ce, "kd": kd, "sr_px": px}

        return step_fn

    def train_step(self, images, labels) -> dict[str, float]:
        bs = batch_sharding(self.mesh, 4)
        ls = batch_sharding(self.mesh, 1)
        images = host_put(images, bs)
        if not isinstance(labels, jax.Array):   # device-fed labels stay put
            labels = np.asarray(labels, np.int32)
        labels = host_put(labels, ls)
        if self.g_state is not None:
            (self.state, self.opt_state, self.g_state, self.g_opt,
             m) = self._step_fn(self.state, self.opt_state, self.g_state,
                                self.g_opt, self.step, images, labels)
        else:
            self.state, self.opt_state, m = self._step_fn(
                self.state, self.opt_state, self.step, images, labels)
        self.step += 1
        if self.step % self.cfg.train.log_every == 0:
            self.metrics.write(self.step,
                               **{k: float(v) for k, v in m.items()})
        return m

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        sd = {"state": self.state, "opt_state": self.opt_state,
              "step": jnp.asarray(self.step, jnp.int32)}
        if self.g_state is not None:
            sd["g_state"] = self.g_state
            sd["g_opt"] = self.g_opt
        return sd

    def load_state_dict(self, sd: dict) -> None:
        self.state = sd["state"]
        self.opt_state = sd["opt_state"]
        if "g_state" in sd:
            self.g_state = sd["g_state"]
            self.g_opt = sd["g_opt"]
        self.step = int(jax.device_get(sd["step"]))

    def sr_apply(self, trainable: bool = False) -> Callable:
        """The (fine-tuned) hallucinator as a pure plug (normalized LR →
        normalized SR) — feed it to make_extract_fn/eval so probes are
        reconstructed by the SAME G the student was trained against."""
        assert self.g_state is not None, "no trainable G (pass sr_module=)"
        from crfr.train.sr_loop import sr_apply_from_state
        return sr_apply_from_state(self.g_graphdef, self.g_state,
                                   trainable=trainable)

    # ------------------------------------------------------------------
    def student_embed_fn(self, with_residual: bool = False,
                         local_snapshot: bool = False):
        """Raw pixels → student embedding (optionally s + r), compiled once,
        reading the trainer's LIVE state at every call.

        ``local_snapshot=True``: snapshot the (replicated) state to host
        per call and run a process-LOCAL single-device program — the
        multi-host in-training-eval convention (every host evaluates
        redundantly; see ``parallel.mesh.local_snapshot``)."""
        graphdef = self.graphdef

        @jax.jit
        def f(state, images):
            student = nnx.merge(graphdef, state)
            s = student.backbone(normalize(jnp.asarray(images, jnp.float32)),
                                 train=False)
            if with_residual:
                return s + student.residual(s, train=False)
            return s

        if local_snapshot:
            from crfr.parallel.mesh import local_snapshot as snap

            # snapshot ONCE per trained step, not per eval batch: weights
            # cannot change mid-eval, and per-batch snapshots would D2H+H2D
            # the whole param tree for every batch
            cache: dict = {}

            def snap_state():
                if cache.get("step") != self.step:
                    cache.update(step=self.step, state=snap(self.state))
                return cache["state"]

            return lambda images: f(snap_state(), images)

        # shard eval batches over the mesh (divisible sizes): replicated
        # inputs would make GSPMD run the full batch on every device
        mesh = self.mesh

        def run(images):
            if not hasattr(images, "shape"):
                images = np.asarray(images)
            return f(self.state, maybe_shard_batch(mesh, images))

        return run
