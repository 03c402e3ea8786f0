"""Two-process multi-host worker (driven by tests/test_multihost.py).

Boots exactly like a real multi-host pod launch: platform →
``maybe_initialize_distributed()`` from CRFR_* env → UNCHANGED Trainer code
over a (data=4, model=2) mesh whose rows span the process boundary. With no
CRFR_* env set it is the single-process 8-device control for the same
program. Prints machine-parseable lines the parent test asserts on:

  ACTIVE <bool> <process_count> <device_count> <local_device_count>
  LOSSES <l0> <l1> <l2>
  SHARD <start> <stop>

SURVEY.md §5.8 (multi-host DP over DCN); VERDICT r1 weak #6 / next #6.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# persistent cache is loadable here because the parent test pins
# --xla_cpu_max_isa (see tests/conftest.py for why); warm ranks compile
# in lockstep, far inside gloo's 30 s key-exchange timeout
jax.config.update("jax_compilation_cache_dir", "/tmp/crfr_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from crfr.parallel.multihost import maybe_initialize_distributed, process_shard

active = maybe_initialize_distributed()
print("ACTIVE", active, jax.process_count(), jax.device_count(),
      jax.local_device_count(), flush=True)

from crfr.configs import Config, DataCfg, LossCfg, MeshCfg, ModelCfg, TrainCfg
from crfr.data.synthetic import SyntheticFaces
from crfr.train.loop import Trainer

cfg = Config(
    name="mh-test",
    mesh=MeshCfg(data=4, model=2),
    data=DataCfg(image_size=32, num_classes=6, degrade_min=16,
                 degrade_max=32),
    model=ModelCfg(backbone="ir_18", compute_dtype="float32", dropout=0.0,
                   input_size=32),
    loss=LossCfg(scale=16.0, margin=0.2, ce_impl="sharded"),
    train=TrainCfg(batch_size=16, lr=0.05, warmup_steps=0,
                   weight_decay=5e-4, log_every=100, seed=0),
)
tr = Trainer(cfg, steps_per_epoch=10)
data = SyntheticFaces(num_classes=6, image_size=32, seed=0)
losses = []
for imgs, labels in data.batches(16, 3, seed=1):
    # every host feeds the same GLOBAL batch; device_put extracts the
    # addressable shards (SPMD convention for host-replicated input)
    m = tr.train_step(imgs, labels)
    losses.append(float(jax.device_get(m["loss"])))
print("LOSSES", " ".join(f"{l:.6f}" for l in losses), flush=True)
print("SHARD", *process_shard(10), flush=True)

# ---------------------------------------------------------------------------
# Local-slab DP input convention (host_put_local via device_feed(local=True)):
# each process feeds ONLY its (batch/P)-row slab of a distinct global batch —
# the ADVICE-r2 cmd_train convention. The single-process control feeds the
# full global batch; trajectories must match to float tolerance.
# ---------------------------------------------------------------------------
import numpy as np

from crfr.train.feed import device_feed


def global_batch(i):
    r = np.random.default_rng(50 + i)
    return (r.integers(0, 255, (16, 32, 32, 3)).astype(np.uint8),
            r.integers(0, 6, (16,)).astype(np.int32))


if active:
    p, B = jax.process_index(), 16 // jax.process_count()
    local_batches = [(g[0][p * B:(p + 1) * B], g[1][p * B:(p + 1) * B])
                     for g in (global_batch(i) for i in range(3))]
else:
    local_batches = [global_batch(i) for i in range(3)]
tr2 = Trainer(cfg, steps_per_epoch=10)
losses_local = []
for di, dl in device_feed(iter(local_batches), tr2.mesh, local=active):
    m = tr2.train_step(di, dl)
    losses_local.append(float(jax.device_get(m["loss"])))
print("LOSSES_LOCAL", " ".join(f"{l:.6f}" for l in losses_local), flush=True)

# ---------------------------------------------------------------------------
# One distill step across the process boundary (VERDICT r2 next #4): teacher
# forward + student + sharded CE + KD in one program over the same mesh.
# ---------------------------------------------------------------------------
from crfr.train.distill_loop import DistillTrainer, teacher_from_trainer

dcfg = cfg.override(**{"loss.distill_weight": 1.0})
st = DistillTrainer(dcfg, teacher_from_trainer(tr), steps_per_epoch=10,
                    kd_normalize=True)
losses_distill = []
for imgs, labels in data.batches(16, 2, seed=3):
    m = st.train_step(imgs, labels)
    losses_distill.append(float(jax.device_get(m["loss"])))
print("LOSSES_DISTILL", " ".join(f"{l:.6f}" for l in losses_distill),
      flush=True)

# ---------------------------------------------------------------------------
# In-training eval under multi-host (cmd_train's local-snapshot path): the
# REPLICATED embed state is locally addressable, so EVERY host snapshots it
# and runs .bin verification as a purely LOCAL single-device program —
# redundantly (identical data → identical result). Redundancy keeps ranks
# in lockstep: a single evaluating rank would leave the others stuck in the
# next train step's collective past gloo's timeout (observed). The
# class-sharded head W is NOT addressable and is zero-substituted (the
# backbone forward never reads it). One more cross-process train step after
# eval proves nothing deadlocked.
# ---------------------------------------------------------------------------
import tempfile

from crfr.data.bins import evaluate_bin, save_bin
from crfr.eval.extract import make_extract_fn

i1, i2, issame = data.eval_pairs(np.random.default_rng(4), 8)
bin_path = os.path.join(tempfile.mkdtemp(), "pairs.bin")
save_bin(bin_path, i1.astype(np.uint8), i2.astype(np.uint8), issame)


from crfr.parallel.mesh import local_snapshot

fn = make_extract_fn(tr.backbone_apply,
                     state_fn=lambda: local_snapshot(tr.embed_state()),
                     image_size=32)
res = evaluate_bin(bin_path, fn, 16, 32, n_folds=2)
print(f"EVAL_MH {res.accuracy_mean:.6f}", flush=True)

post = []
for imgs, labels in data.batches(16, 1, seed=5):
    m = tr.train_step(imgs, labels)
    post.append(float(jax.device_get(m["loss"])))
print("LOSSES_POST_EVAL", " ".join(f"{l:.6f}" for l in post), flush=True)

# ---------------------------------------------------------------------------
# SR GAN trainer across the process boundary: G and D steps (batch sharded
# over the cross-process mesh, DP grad psum over "DCN") — the third trainer
# of the multi-host story. Identical replicated losses on every rank ==
# single-process control.
# ---------------------------------------------------------------------------
from crfr.train.sr_loop import SRTrainer

sr_tr = SRTrainer(cfg, scale=4, n_priors=4)
sr_losses = []
for imgs, _ in data.batches(16, 2, seed=7):
    m = sr_tr.train_step(imgs)
    sr_losses.append(float(jax.device_get(m["g_loss"])))
print("LOSSES_SR", " ".join(f"{l:.6f}" for l in sr_losses), flush=True)
