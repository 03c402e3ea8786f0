"""Hallucinator (SR GAN) training driver — SURVEY.md §3.2 rebuilt TPU-first.

One jitted program per G-step and D-step, alternating; each step:

  HR batch (device) → bicubic↓ (matmul operator) → LR
  G: sr, coarse, priors = Hallucinator(LR)
     L_G = w_px·‖sr−hr‖ + w_adv·LSGAN(D(sr)) + w_id·‖T̂(sr)−T̂(hr)‖
           + w_pr·‖priors − priors_target(hr)‖  (+ coarse pixel anchor)
  D: L_D = LSGAN(D(hr), D(sr.stop_grad))

The paired LR/HR loader of the reference (§3.2 "paired loader") disappears:
LR is synthesized on device from the HR batch with the same composed bicubic
operators as the eval protocol — one fewer host pipeline, bit-consistent
degradation semantics between train and eval.

The teacher (frozen recognition backbone) and the prior-target function are
injected as pure jittable callables, both optional.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax.sharding import Mesh

from crfr.configs import Config
from crfr.losses import gan as gl
from crfr.models.sr import Discriminator, Hallucinator
from crfr.ops.bicubic import resize_matrix
from crfr.ops.normalize import normalize
from crfr.parallel.mesh import (batch_sharding, host_put, host_put_tree,
                                make_mesh, replicated)
from crfr.utils.logging import MetricsWriter


class SRTrainer:
    # SR checkpoint format version. v2 added: the bicubic-skip coarse path
    # (pre-v2 generators learned the FULL output), the g_ema shadow state,
    # and this meta record itself. Restores of pre-v2 checkpoints go through
    # the tolerant path in ``restore_from``.
    FORMAT_VERSION = 2

    def __init__(self, cfg: Config, scale: int = 8, n_priors: int = 16,
                 mesh: Mesh | None = None, lr_g: float = 1e-4,
                 lr_d: float = 1e-4, teacher_fn: Callable | None = None,
                 prior_target_fn: Callable | None = None,
                 perceptual_fn: Callable | None = None,
                 metrics: MetricsWriter | None = None,
                 adv_mode: str = "lsgan", ema_decay: float = 0.999,
                 bicubic_skip: bool = True, schedule: str = "constant",
                 total_steps: int = 100_000, warmup_steps: int = 0,
                 n_d_steps: int = 1, r1_gamma: float = 0.0):
        """GAN-robustness knobs (VERDICT r2 weak #6):

        ``schedule`` — 'constant' or 'cosine' Adam LR decay over
        ``total_steps`` with ``warmup_steps`` linear warmup (both G and D).
        ``n_d_steps`` — D updates per G update (same batch; the standard
        rescue when D lags the generator).
        ``r1_gamma`` — R1 gradient penalty γ/2·E‖∇ₓD(x_real)‖² on the
        D step (0 disables) — keeps D's decision boundary smooth when it
        starts winning.
        """
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.metrics = metrics or MetricsWriter(stdout=False)
        self.scale = scale
        self.n_priors = n_priors
        self.bicubic_skip = bicubic_skip
        size = cfg.data.image_size
        assert size % scale == 0
        self.lr_size = size // scale

        gen = Hallucinator(scale=scale, n_priors=n_priors, rngs=nnx.Rngs(0),
                           bicubic_skip=bicubic_skip)
        disc = Discriminator(rngs=nnx.Rngs(1))
        self.g_graphdef, g_state = nnx.split(gen)
        self.d_graphdef, d_state = nnx.split(disc)
        self.ema_decay = ema_decay
        self.n_d_steps = max(int(n_d_steps), 1)
        self.r1_gamma = float(r1_gamma)

        def _sched(peak):
            if schedule == "cosine":
                main = optax.cosine_decay_schedule(
                    peak, max(total_steps - warmup_steps, 1))
            else:
                main = optax.constant_schedule(peak)
            if warmup_steps <= 0:
                return main
            warm = optax.linear_schedule(0.0, peak, warmup_steps)
            return optax.join_schedules([warm, main], [warmup_steps])

        self.g_tx = optax.adam(_sched(lr_g), b1=0.9, b2=0.99)
        self.d_tx = optax.adam(_sched(lr_d), b1=0.9, b2=0.99)

        rep = replicated(self.mesh)
        self.g_state = host_put_tree(g_state, rep)
        self.d_state = host_put_tree(d_state, rep)
        # EMA shadow of the full generator state (params + BN stats) — the
        # weights served at inference/eval time (GAN training is noisy; the
        # EMA trajectory is the standard stabilizer). ema_decay=0 disables.
        self.g_ema = (jax.tree_util.tree_map(jnp.copy, self.g_state)
                      if ema_decay > 0 else None)
        self.g_opt = host_put_tree(self.g_tx.init(
            nnx.state(gen, nnx.Param)), rep)
        self.d_opt = host_put_tree(self.d_tx.init(
            nnx.state(disc, nnx.Param)), rep)
        self.step = 0

        # Downsample operator HR→LR (f32 'pil' semantics, as in eval).
        self._down = host_put(
            jnp.asarray(resize_matrix(size, self.lr_size,
                                      cfg.data.resize_mode)), rep)

        self.teacher_fn = teacher_fn
        self.prior_target_fn = prior_target_fn
        # perceptual_fn: normalized pixels -> list of feature maps (e.g. the
        # frozen teacher's IRBackbone.features) for the perceptual term
        self.perceptual_fn = perceptual_fn
        lc = cfg.loss
        self.weights = dict(px=lc.sr_pixel_weight, adv=lc.sr_adv_weight,
                            id=lc.sr_identity_weight, pr=lc.sr_prior_weight,
                            pc=lc.sr_perceptual_weight)
        self.adv_mode = adv_mode
        self._g_step, self._d_step = self._build_steps()
        decay = ema_decay

        @jax.jit
        def _ema_step(ema, cur, step):
            # warmup-corrected decay (BYOL/Adam-style): early steps track
            # the live weights closely, long runs converge to ema_decay —
            # otherwise a short run would serve ~init weights.
            d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))

            def _lerp(e, c):
                if jnp.issubdtype(e.dtype, jnp.floating):
                    return e * d + c.astype(e.dtype) * (1.0 - d)
                return c                  # int leaves (rng counts): track

            return jax.tree_util.tree_map(_lerp, ema, cur)

        self._ema_step = _ema_step
        self._iq_fn = None

    # ------------------------------------------------------------------
    def _build_steps(self):
        g_graphdef, d_graphdef = self.g_graphdef, self.d_graphdef
        down = self._down
        w = self.weights
        teacher_fn = self.teacher_fn
        prior_target_fn = self.prior_target_fn
        perceptual_fn = self.perceptual_fn
        adv_mode = self.adv_mode
        g_tx, d_tx = self.g_tx, self.d_tx

        def degrade(hr):
            # hr in [-1, 1] normalized space; operator is linear so it
            # applies directly.
            return jnp.einsum("oi,bijc,pj->bopc", down, hr, down,
                              preferred_element_type=jnp.float32)

        def g_loss_core(gen, disc, hr, lr, prior_t):
            """Shared G objective; ``prior_t`` is the prior-supervision
            target array (None disables the term — trace-time constant)."""
            sr, coarse, priors = gen(lr, train=True)
            loss = w["px"] * (gl.pixel_loss(sr, hr)
                              + 0.5 * gl.pixel_loss(coarse, hr))
            logits = disc(sr, train=False)
            loss = loss + w["adv"] * gl.adversarial_g_loss(logits, adv_mode)
            if teacher_fn is not None and w["id"] > 0:
                loss = loss + w["id"] * gl.identity_loss(
                    teacher_fn(sr), teacher_fn(hr))
            if prior_t is not None and w["pr"] > 0:
                loss = loss + w["pr"] * gl.prior_loss(priors, prior_t)
            if perceptual_fn is not None and w["pc"] > 0:
                loss = loss + w["pc"] * gl.perceptual_loss(
                    perceptual_fn(sr), perceptual_fn(hr))
            return loss, sr

        def g_update(gen, g_opt, loss_fn):
            (loss, sr), grads = nnx.value_and_grad(loss_fn, has_aux=True)(gen)
            params = nnx.state(gen, nnx.Param)
            updates, g_opt = g_tx.update(grads, g_opt, params)
            nnx.update(gen, jax.tree_util.tree_map(jnp.add, params, updates))
            _, g_state = nnx.split(gen)
            return g_state, g_opt, loss, jax.lax.stop_gradient(sr)

        @partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_state, g_opt, d_state, hr):
            gen = nnx.merge(g_graphdef, g_state)
            disc = nnx.merge(d_graphdef, d_state)
            lr = degrade(hr)
            pt = prior_target_fn(hr) if prior_target_fn is not None else None
            return g_update(gen, g_opt,
                            lambda gen: g_loss_core(gen, disc, hr, lr, pt))

        @partial(jax.jit, donate_argnums=(0, 1))
        def g_step_supervised(g_state, g_opt, d_state, hr, prior_t):
            # per-batch prior targets (landmark heatmaps + parsing maps
            # from ground-truth landmarks riding with the batch)
            gen = nnx.merge(g_graphdef, g_state)
            disc = nnx.merge(d_graphdef, d_state)
            lr = degrade(hr)
            return g_update(gen, g_opt,
                            lambda gen: g_loss_core(gen, disc, hr, lr,
                                                    prior_t))

        self._g_step_supervised = g_step_supervised

        r1_gamma = self.r1_gamma

        @partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_state, d_opt, hr, sr):
            disc = nnx.merge(d_graphdef, d_state)

            def loss_fn(disc):
                loss = gl.adversarial_d_loss(disc(hr, train=True),
                                             disc(sr, train=True), adv_mode)
                if r1_gamma > 0:
                    # R1: γ/2·E‖∇ₓD(x_real)‖² — gradient OF the logits WITH
                    # RESPECT TO pixels, inside the param-gradient trace
                    def logit_sum(x):
                        return jnp.sum(disc(x, train=False))

                    gx = jax.grad(logit_sum)(hr)
                    loss = loss + 0.5 * r1_gamma * jnp.mean(
                        jnp.sum(jnp.square(gx.astype(jnp.float32)),
                                axis=(1, 2, 3)))
                return loss

            loss, grads = nnx.value_and_grad(loss_fn)(disc)
            params = nnx.state(disc, nnx.Param)
            updates, d_opt = d_tx.update(grads, d_opt, params)
            nnx.update(disc, jax.tree_util.tree_map(jnp.add, params, updates))
            _, d_state = nnx.split(disc)
            return d_state, d_opt, loss

        return g_step, d_step

    # ------------------------------------------------------------------
    def prior_targets_from_landmarks(self, landmarks) -> jax.Array:
        """(B, 5, 2) pixel-coord landmarks → the (B, S, S, n_priors)
        supervision target: 5 landmark heatmaps ++ 11 parsing maps
        (n_priors=16, the full FSRNet-style prior) or heatmaps only
        (n_priors=5). The renderer emits ground-truth landmarks
        (data/render.py render(return_landmarks=True)); real datasets
        use their annotations or the MTCNN cascade."""
        from crfr.ops.heatmaps import landmark_heatmaps, prior_targets

        size = self.cfg.data.image_size
        lm = jnp.asarray(landmarks, jnp.float32)
        if self.n_priors == 5:
            return landmark_heatmaps(lm, size=size)
        pt = prior_targets(lm, size=size)
        if pt.shape[-1] != self.n_priors:
            raise ValueError(
                f"n_priors={self.n_priors} matches neither heatmaps-only "
                f"(5) nor heatmaps+parsing ({pt.shape[-1]})")
        return pt

    def train_step(self, hr_images, landmarks=None) -> dict[str, float]:
        """hr_images: raw pixels (B,S,S,3) uint8/f32; one G step +
        ``n_d_steps`` D steps (same batch). ``landmarks`` (B, 5, 2)
        pixel coords switch the prior term to per-batch supervised
        targets (heatmaps + parsing maps) regardless of
        ``prior_target_fn``."""
        bs = batch_sharding(self.mesh, 4)
        hr = host_put(normalize(jnp.asarray(hr_images, jnp.float32)), bs)
        if landmarks is not None:
            pt = host_put(self.prior_targets_from_landmarks(landmarks), bs)
            self.g_state, self.g_opt, g_loss, sr = self._g_step_supervised(
                self.g_state, self.g_opt, self.d_state, hr, pt)
        else:
            self.g_state, self.g_opt, g_loss, sr = self._g_step(
                self.g_state, self.g_opt, self.d_state, hr)
        if self.g_ema is not None:
            self.g_ema = self._ema_step(self.g_ema, self.g_state,
                                        jnp.asarray(self.step, jnp.float32))
        for _ in range(self.n_d_steps):
            self.d_state, self.d_opt, d_loss = self._d_step(
                self.d_state, self.d_opt, hr, sr)
        self.step += 1
        if self.step % self.cfg.train.log_every == 0:
            iq = self.psnr_ssim(hr_images)      # SR-quality trace (paper's
            self.metrics.write(self.step, g_loss=float(g_loss),   # headline)
                               d_loss=float(d_loss), **iq)
        return {"g_loss": g_loss, "d_loss": d_loss}

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        """Checkpointable pytree of the full GAN training state. ``meta``
        records the format version and the architecture switches that change
        forward semantics (a restored generator trained WITHOUT the bicubic
        skip must not silently run with it added — ADVICE r2)."""
        sd = {"g_state": self.g_state, "d_state": self.d_state,
              "g_opt": self.g_opt, "d_opt": self.d_opt,
              "step": jnp.asarray(self.step, jnp.int32),
              "meta": {"version": jnp.asarray(self.FORMAT_VERSION, jnp.int32),
                       "bicubic_skip": jnp.asarray(int(self.bicubic_skip),
                                                   jnp.int32),
                       "scale": jnp.asarray(self.scale, jnp.int32),
                       "n_priors": jnp.asarray(self.n_priors, jnp.int32)}}
        if self.g_ema is not None:
            sd["g_ema"] = self.g_ema
        return sd

    def load_state_dict(self, sd: dict) -> None:
        meta = sd.get("meta")
        if meta is not None:
            skip = bool(jax.device_get(meta["bicubic_skip"]))
            if skip != self.bicubic_skip:
                raise ValueError(
                    f"SR checkpoint was trained with bicubic_skip={skip} but "
                    f"this trainer was built with {self.bicubic_skip} — the "
                    f"forward would silently change. Rebuild with "
                    f"SRTrainer(..., bicubic_skip={skip}) / "
                    f"--sr-bicubic-skip={'1' if skip else '0'}.")
            ck_scale = int(jax.device_get(meta["scale"]))
            if ck_scale != self.scale:
                raise ValueError(f"SR checkpoint scale {ck_scale} != "
                                 f"trainer scale {self.scale}")
        self.g_state = sd["g_state"]
        self.d_state = sd["d_state"]
        self.g_opt = sd["g_opt"]
        self.d_opt = sd["d_opt"]
        self.g_ema = sd.get("g_ema", self.g_ema)
        self.step = int(jax.device_get(sd["step"]))

    def restore_from(self, ck, step: int | None = None) -> None:
        """Format-tolerant restore: build the Orbax template from the
        INTERSECTION of this trainer's state_dict keys with the checkpoint's
        stored keys, so older checkpoints (no g_ema / no meta — pre-v2)
        restore cleanly. A pre-v2 checkpoint predates the bicubic-skip coarse
        path, so restoring it into the default (skip=True) trainer raises
        with the fix spelled out; g_ema missing → seeded from g_state."""
        template = self.state_dict()
        stored = ck.state_keys(step)
        if stored is not None:
            missing = [k for k in template if k not in stored]
            template = {k: v for k, v in template.items() if k in stored}
            if "meta" not in stored and self.bicubic_skip:
                raise ValueError(
                    "SR checkpoint predates format v2 (no meta record): it "
                    "was trained WITHOUT the bicubic-skip coarse path. "
                    "Restore with SRTrainer(..., bicubic_skip=False) / "
                    "--sr-bicubic-skip=0.")
        else:
            missing = []
        sd = ck.restore(template, step=step)
        self.load_state_dict(sd)
        if "g_ema" in missing and self.g_ema is not None:
            self.g_ema = jax.tree_util.tree_map(jnp.copy, self.g_state)

    # ------------------------------------------------------------------
    def _serve_state(self, ema: bool = True):
        return self.g_ema if (ema and self.g_ema is not None) else self.g_state

    def generator(self, ema: bool = True) -> Hallucinator:
        return nnx.merge(self.g_graphdef, self._serve_state(ema))

    def sr_apply(self, trainable: bool = False, ema: bool = True) -> Callable:
        """Freeze the generator into a pure jittable callable (normalized LR
        pixels → normalized SR pixels) — the plug that feeds hallucinated
        faces into recognition (DistillTrainer sr_fn / make_extract_fn
        sr_apply). ``trainable=False`` stop-gradients the output (G frozen
        under the consumer's jax.grad); ``ema`` serves the EMA weights."""
        return sr_apply_from_state(self.g_graphdef, self._serve_state(ema),
                                   trainable=trainable)

    def psnr_ssim(self, hr_images, ema: bool = True) -> dict[str, float]:
        """Image-quality probe on a batch: degrade → hallucinate → compare
        to HR (PSNR/SSIM, crfr.eval.image_quality). One jitted program,
        compiled once, threading the live generator state."""
        if self._iq_fn is None:
            g_graphdef, down = self.g_graphdef, self._down

            @jax.jit
            def f(g_state, hr_raw):
                from crfr.eval.image_quality import psnr, ssim
                from crfr.ops.normalize import denormalize

                hr = normalize(hr_raw.astype(jnp.float32))
                lr = jnp.einsum("oi,bijc,pj->bopc", down, hr, down,
                                preferred_element_type=jnp.float32)
                sr, _, _ = nnx.merge(g_graphdef, g_state)(lr, train=False)
                a = jnp.clip(denormalize(sr), 0, 255)
                b = jnp.clip(denormalize(hr), 0, 255)
                return (jnp.mean(psnr(a, b, max_val=255.0)),
                        jnp.mean(ssim(a, b, max_val=255.0)))

            self._iq_fn = f
        p, s = self._iq_fn(self._serve_state(ema),
                           jnp.asarray(hr_images, jnp.float32))
        return {"psnr": float(p), "ssim": float(s)}

    def sr_fn(self, ema: bool = True):
        """Raw LR pixels (B,s,s,3) → SR pixels [0,255], compiled once,
        reading the trainer's LIVE generator state at every call."""
        g_graphdef = self.g_graphdef

        @jax.jit
        def f(g_state, lr_images):
            gen = nnx.merge(g_graphdef, g_state)
            sr, _, _ = gen(normalize(jnp.asarray(lr_images, jnp.float32)),
                           train=False)
            from crfr.ops.normalize import denormalize
            return jnp.clip(denormalize(sr), 0.0, 255.0)

        return lambda lr_images: f(self._serve_state(ema), lr_images)


# ---------------------------------------------------------------------------
# Frozen-hallucinator plugs — SR output INTO recognition (the paper's title:
# prior-aided face hallucination FOR cross-resolution recognition; SURVEY.md
# §3.2 → §3.5 pipeline join).
# ---------------------------------------------------------------------------


def perceptual_from_trainer(trainer) -> Callable:
    """Freeze a recognition Trainer's backbone into a pure stage-features
    callable (normalized pixels → list of feature maps) for
    ``SRTrainer(perceptual_fn=…)``. Backbone must expose ``features``
    (IRBackbone does).

    NOTE: the OUTPUT must stay differentiable w.r.t. ``x`` — the generator's
    perceptual gradient flows through these taps. The teacher's params are
    closed-over constants, so no gradient reaches the teacher anyway, and
    ``gan.perceptual_loss`` stop-gradients the HR side itself."""
    graphdef = trainer.graphdef
    states = (trainer.state["params"], trainer.state["batch_stats"],
              trainer.state["rng_state"])

    def f(x):
        model = nnx.merge(graphdef, *states)
        bb = getattr(model, "backbone", model)
        return list(bb.features(x, train=False))

    return f


def sr_apply_from_state(g_graphdef, g_state, trainable: bool = False
                        ) -> Callable:
    """(graphdef, state) of a Hallucinator → pure callable: normalized LR
    pixels (B, s, s, 3) → normalized SR pixels (B, s·scale, s·scale, 3)."""

    def f(lr_norm):
        gen = nnx.merge(g_graphdef, g_state)
        sr, _, _ = gen(lr_norm, train=False)
        return sr if trainable else jax.lax.stop_gradient(sr)

    return f


def load_sr_apply(ckpt_dir: str, cfg: Config, scale: int = 8,
                  n_priors: int = 16, trainable: bool = False,
                  ema: bool = True, bicubic_skip: bool = True) -> Callable:
    """Restore a trained Hallucinator from an SR checkpoint directory and
    freeze it into the pure SR plug. ``scale``/``n_priors``/``bicubic_skip``
    must match the values the checkpoint was trained with (CLI: --sr-scale /
    --sr-bicubic-skip); format-tolerant restore_from verifies them against
    the checkpoint's meta record."""
    from crfr.train.checkpoints import Checkpointer

    tr = SRTrainer(cfg, scale=scale, n_priors=n_priors,
                   bicubic_skip=bicubic_skip)
    ck = Checkpointer(ckpt_dir, keep=1)
    tr.restore_from(ck)
    ck.close()
    return sr_apply_from_state(tr.g_graphdef, tr._serve_state(ema),
                               trainable=trainable)
