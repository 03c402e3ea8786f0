"""Training driver — jitted DP/TP step over the mesh (SURVEY.md §2.1
"Training loop", §3.1 call stack, rebuilt TPU-first).

Architecture of one step (all inside ONE jitted program, donated state):

  batch (host uint8, batch-sharded over the full mesh)
    → on-device degradation augmentation (matmul operators, crfr.ops.bicubic)
    → normalize (x−127.5)/128 → bf16
    → IR backbone forward (MXU convs) + BN stat updates
    → margin-softmax CE:
        mesh.model == 1 → dense head (one (B,512)×(512,C) GEMM)
        mesh.model  > 1 → PartialFC class-sharded CE (shard_map psum/pmax)
    [+ optional residual-KD term vs a frozen teacher]
    → SGD+momentum update (optax), weight decay masked off BN/PReLU/bias
       (the reference family's paras_wo_bn convention)

DP gradients allreduce automatically: the batch is sharded, params are
replicated, so XLA inserts the psum over ICI during backprop — no user-level
collective code (SURVEY.md §2.4).

Rng discipline: a single threaded jax.random key in the train state; dropout
keys split per step (resume-deterministic — the step counter re-derives the
stream).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Iterator

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
from crfr.ops.bicubic import degrade_matrix
from crfr.ops.normalize import normalize
from crfr.parallel.mesh import (batch_sharding, class_sharding, host_put,
                                make_mesh, maybe_shard_batch,
                                pad_to_multiple, replicated)
from crfr.utils.logging import MetricsWriter


def lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Linear warmup → step drops (reference convention) or cosine decay
    (cfg.train.schedule)."""
    t = cfg.train
    if getattr(t, "schedule", "step") == "cosine":
        total = max(t.epochs * steps_per_epoch - t.warmup_steps, 1)
        main = optax.cosine_decay_schedule(t.lr, total)
    else:
        # join_schedules passes (global_step − warmup) to this schedule, so
        # boundaries configured in GLOBAL steps must be shifted by warmup.
        boundaries = {max(e * steps_per_epoch - t.warmup_steps, 1):
                      t.lr_drop_factor for e in t.lr_drop_epochs}
        main = optax.piecewise_constant_schedule(t.lr, boundaries)
    if t.warmup_steps <= 0:
        return main
    warm = optax.linear_schedule(0.0, t.lr, t.warmup_steps)
    return optax.join_schedules([warm, main], [t.warmup_steps])


def _wd_mask(params) -> Any:
    """True where weight decay applies: conv/linear kernels and head W only
    (BN scale/bias, PReLU alpha, biases excluded — reference-family rule).

    Matched on path COMPONENTS ('kernel' / 'weight'), not suffixes: nnx
    Param paths end in a 'value' leaf ('head/weight/value'), so an
    endswith('weight') check silently missed the ArcFace W."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path) -> bool:
        names = {str(getattr(p, "name", getattr(p, "key", p))) for p in path}
        return bool(names & {"kernel", "weight"})

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [decide(p) for p, _ in flat])


def make_sgd_tx(cfg: Config, params, schedule) -> optax.GradientTransformation:
    """The shared recognition-training optimizer chain: SGD+momentum with
    weight decay masked off BN/PReLU/bias and optional global-norm grad
    clipping. Used by BOTH the main Trainer and DistillTrainer so student
    training regularizes exactly like teacher training."""
    tx = optax.sgd(schedule, momentum=cfg.train.momentum)
    if cfg.train.weight_decay:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.train.weight_decay,
                                      mask=_wd_mask(params)), tx)
    if cfg.train.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm),
                         tx)
    return tx


class FaceTrainModel(nnx.Module):
    """Backbone + margin head in one module so a single split/merge carries
    all params, BN stats and rng state through the jitted step."""

    def __init__(self, cfg: Config, *, rngs: nnx.Rngs):
        mc, lc = cfg.model, cfg.loss
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(
            mc.backbone, embedding_dim=mc.embedding_dim, dropout=mc.dropout,
            input_size=mc.input_size, remat=getattr(mc, "remat", False),
            rngs=rngs, dtype=dtype)
        # Pad classes so the class axis divides the model mesh axis; padding
        # classes are masked out of every CE variant via num_valid.
        c_pad = pad_to_multiple(cfg.data.num_classes, cfg.mesh.model)
        self.head = MarginHead(mc.embedding_dim, c_pad,
                               margin_type=lc.head, s=lc.scale, m=lc.margin,
                               easy_margin=lc.easy_margin,
                               num_valid=(cfg.data.num_classes
                                          if c_pad != cfg.data.num_classes
                                          else None), rngs=rngs)


# Train state is a plain dict pytree: {params, batch_stats, rng_state,
# opt_state, step}. The (static) nnx graphdef lives on the Trainer, not in
# the state, so the whole state jits/donates/checkpoints as arrays only.


class Trainer:
    """Owns mesh placement, the jitted step, metrics and (optional) teacher."""

    def __init__(self, cfg: Config, mesh: Mesh | None = None,
                 steps_per_epoch: int = 1000,
                 metrics: MetricsWriter | None = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.metrics = metrics or MetricsWriter(stdout=False)
        self.steps_per_epoch = steps_per_epoch

        model = FaceTrainModel(cfg, rngs=nnx.Rngs(cfg.train.seed))
        graphdef, params, batch_stats, rng_state = nnx.split(
            model, nnx.Param, nnx.BatchStat, nnx.RngState)

        self.schedule = lr_schedule(cfg, steps_per_epoch)
        self.tx = make_sgd_tx(cfg, params, self.schedule)

        # --- mesh placement: params replicated EXCEPT head W class-sharded.
        rep = replicated(self.mesh)
        cls = class_sharding(self.mesh)

        def place(path, x):
            s = "/".join(str(getattr(p, "name", getattr(p, "key", p)))
                         for p in path)
            if "head" in s and "weight" in s and self.cfg.mesh.model > 1:
                return host_put(x, cls)
            return host_put(x, rep)

        params = jax.tree_util.tree_map_with_path(place, params)
        opt_state = self.tx.init(params)
        opt_state = jax.tree_util.tree_map(
            lambda x: host_put(x, rep), opt_state)  # counts + momentum
        # Momentum buffers for the sharded head W must follow W's sharding;
        # re-place any leaf whose shape matches a sharded param.
        if self.cfg.mesh.model > 1:
            wshape = model.head.weight.value.shape
            opt_state = jax.tree_util.tree_map(
                lambda x: host_put(x, cls)
                if hasattr(x, "shape") and tuple(x.shape) == tuple(wshape)
                else x, opt_state)

        self.graphdef = graphdef
        self.state = {
            "params": params,
            "batch_stats": jax.tree_util.tree_map(
                lambda x: host_put(x, rep), batch_stats),
            "rng_state": jax.tree_util.tree_map(
                lambda x: host_put(x, rep), rng_state),
            "opt_state": opt_state,
            "step": host_put(jnp.zeros((), jnp.int32), rep),
        }

        # CE implementation selection (cfg.loss.ce_impl):
        #   sharded   — PartialFC over the 'model' mesh axis
        #   streaming — flash-softmax class-block scan (single-chip big-C)
        #   dense     — one (B, C) GEMM
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

        # Degradation operator table (L, S, S) for random multi-res aug.
        dc = cfg.data
        lows = list(range(dc.degrade_min, min(dc.degrade_max, dc.image_size) + 1))
        self._degrade_lows = lows
        table = np.stack([degrade_matrix(dc.image_size, l, dc.resize_mode)
                          for l in lows]) if lows else None
        self._degrade_table = (host_put(jnp.asarray(table), rep)
                               if table is not None else None)

        self._teacher_fn: Callable | None = None
        self.distill_weight = cfg.loss.distill_weight
        self._step_fn = self._build_step()
        # Host-side mirror of state['step']: lets the train loop run fully
        # async (no per-step device_get blocking the dispatch queue — the
        # bench-vs-`crfr train` throughput gap of round 1). Re-sync after any
        # external state mutation via ``sync_host_step()``.
        self.host_step = 0

    # ------------------------------------------------------------------
    def sync_host_step(self) -> int:
        """Blockingly read state['step'] into the host mirror (call after
        checkpoint restore or any manual ``state`` assignment)."""
        self.host_step = int(jax.device_get(self.state["step"]))
        return self.host_step

    # ------------------------------------------------------------------
    def set_teacher(self, teacher_apply: Callable[[jax.Array], jax.Array]):
        """Enable residual-KD: teacher_apply(hr_images_normalized) → (B, D).
        Must be a pure jittable function (e.g. a frozen merged model)."""
        self._teacher_fn = teacher_apply
        self._step_fn = self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        graphdef = self.graphdef
        sharded_ce = self._sharded_ce
        ce_impl = self._ce_impl
        table = self._degrade_table
        n_lows = len(self._degrade_lows) if self._degrade_lows else 0
        teacher_fn = self._teacher_fn
        distill_w = cfg.loss.distill_weight
        tx = self.tx

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: dict, images, labels):
            key = jax.random.fold_in(jax.random.key(cfg.train.seed),
                                     state["step"])
            model = nnx.merge(graphdef, state["params"],
                              state["batch_stats"], state["rng_state"])

            def loss_fn(model):
                x = images.astype(jnp.float32)
                # n_lows == 1 (degrade_min == degrade_max) is a FIXED
                # degradation, still applied — only an empty table skips.
                if table is not None and n_lows >= 1:
                    if n_lows == 1:
                        w = table[0]
                        x = jnp.einsum("oi,bijc,pj->bopc", w, x, w,
                                       preferred_element_type=jnp.float32)
                    elif cfg.data.per_sample_degrade:
                        idx = jax.random.randint(key, (x.shape[0],), 0, n_lows)
                        w = table[idx]                       # (B, S, S)
                        x = jnp.einsum("boi,bijc,bpj->bopc", w, x, w,
                                       preferred_element_type=jnp.float32)
                    else:
                        idx = jax.random.randint(key, (), 0, n_lows)
                        w = table[idx]
                        x = jnp.einsum("oi,bijc,pj->bopc", w, x, w,
                                       preferred_element_type=jnp.float32)
                x = normalize(x)
                emb = model.backbone(x, train=True)
                if sharded_ce is not None:
                    loss = sharded_ce(emb, labels, model.head.weight.value)
                elif ce_impl == "streaming":
                    from crfr.losses.arcface import streaming_margin_ce
                    loss = streaming_margin_ce(
                        emb, model.head.weight.value, labels,
                        margin_type=cfg.loss.head, s=cfg.loss.scale,
                        m=cfg.loss.margin, easy_margin=cfg.loss.easy_margin,
                        block=cfg.loss.ce_block,
                        num_valid=model.head.num_valid)
                else:
                    loss = model.head.loss(emb, labels)
                if teacher_fn is not None and distill_w > 0:
                    hr = normalize(images.astype(jnp.float32))
                    t_emb = teacher_fn(hr)
                    loss = loss + residual_kd_loss(emb, jnp.zeros_like(emb),
                                                   t_emb, weight=distill_w)
                return loss

            # nnx.value_and_grad lifts the BN-stat / rng mutations correctly
            # across the grad trace (raw jax.value_and_grad would trip
            # "mutate from a different trace level" on BatchStat).
            loss, grads = nnx.value_and_grad(loss_fn)(model)
            gnorm = optax.global_norm(grads)
            params = nnx.state(model, nnx.Param)
            updates, new_opt = tx.update(grads, state["opt_state"], params)
            new_params = jax.tree_util.tree_map(jnp.add, params, updates)
            nnx.update(model, new_params)
            _, p2, b2, r2 = nnx.split(model, nnx.Param, nnx.BatchStat,
                                      nnx.RngState)
            new_state = {
                "params": p2, "batch_stats": b2, "rng_state": r2,
                "opt_state": new_opt, "step": state["step"] + 1,
            }
            return new_state, {"loss": loss, "grad_norm": gnorm}

        return step_fn

    # ------------------------------------------------------------------
    def train_step(self, images, labels) -> dict[str, float]:
        """One step. images (B, S, S, 3) uint8/f32 raw pixels, labels (B,)."""
        bs = batch_sharding(self.mesh, 4)
        ls = batch_sharding(self.mesh, 1)
        images = host_put(images, bs)
        if not isinstance(labels, jax.Array):   # device-fed labels stay put
            labels = np.asarray(labels, np.int32)
        labels = host_put(labels, ls)
        self.state, m = self._step_fn(self.state, images, labels)
        self.host_step += 1
        return m

    def fit(self, batches: Iterator[tuple[np.ndarray, np.ndarray]],
            max_steps: int | None = None,
            eval_fn: Callable[["Trainer"], dict] | None = None
            ) -> dict[str, float]:
        """Run the train loop. ``eval_fn(trainer) -> {metric: value}`` is the
        in-training evaluation hook (reference §3.1 "every N: evaluate(lfw)"),
        invoked every cfg.train.eval_every_steps and logged to metrics."""
        from crfr.train.feed import device_feed

        t0 = time.time()
        n_img = 0
        last: dict[str, float] = {}
        self.sync_host_step()        # one blocking read, then stay async
        # device_feed: H2D of batch i+1 overlaps the device step of batch i
        for i, (images, labels) in enumerate(device_feed(batches, self.mesh)):
            if max_steps is not None and i >= max_steps:
                break
            m = self.train_step(images, labels)
            n_img += len(labels)
            step = self.host_step    # no device sync on the hot path
            if step % self.cfg.train.log_every == 0 or (
                    max_steps and i == max_steps - 1):
                scalars = {k: float(jax.device_get(v)) for k, v in m.items()}
                last.update(scalars)
                dt = time.time() - t0
                self.metrics.write(step, imgs_per_sec=n_img / max(dt, 1e-9),
                                   lr=float(self.schedule(step)), **scalars)
            if (eval_fn is not None
                    and step % self.cfg.train.eval_every_steps == 0):
                ev = eval_fn(self)
                self.metrics.write(step, **{f"eval_{k}": v
                                            for k, v in ev.items()})
                last.update(ev)
        return last

    # ------------------------------------------------------------------
    @property
    def model(self) -> FaceTrainModel:
        return nnx.merge(self.graphdef, self.state["params"],
                         self.state["batch_stats"], self.state["rng_state"])

    def embed_state(self) -> tuple:
        """The live (params, batch_stats, rng_state) tuple — pass as the
        ``state`` argument of ``backbone_apply`` / ``make_extract_fn``."""
        return (self.state["params"], self.state["batch_stats"],
                self.state["rng_state"])

    def backbone_apply(self, state: tuple, x: jax.Array) -> jax.Array:
        """Pure jittable apply: (embed_state tuple, normalized pixels) →
        embeddings. Use with ``make_extract_fn(..., state_fn=tr.embed_state)``
        so eval always sees the trainer's CURRENT weights."""
        model = nnx.merge(self.graphdef, *state)
        return model.backbone(x, train=False)

    def embed_fn(self):
        """Raw (B,S,S,3) pixels → (B, D) f32, compiled once, reading the
        trainer's LIVE state at every call (keep training; this fn follows).
        Batches divisible by the device count are sharded over the mesh
        (data-parallel embed; unsharded inputs would make GSPMD replicate
        the whole forward on every device)."""
        graphdef = self.graphdef

        @jax.jit
        def f(state, images):
            model = nnx.merge(graphdef, *state)
            return model.backbone(normalize(images), train=False)

        mesh = self.mesh

        def run(images):
            if not hasattr(images, "shape"):
                images = np.asarray(images)
            return f(self.embed_state(), maybe_shard_batch(mesh, images))

        return run
