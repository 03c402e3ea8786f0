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
