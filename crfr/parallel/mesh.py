"""Mesh construction and sharding rules — the distributed backbone.

The reference scales with single-process ``nn.DataParallel`` only (SURVEY.md
§2.3/§2.4); here every distributed decision is declarative: one
``jax.sharding.Mesh`` with axes ``('data', 'model')``, NamedShardings derived
from it, and XLA emits the collectives over ICI/DCN.

- ``data``  — batch axis (DP). Gradients psum over this axis inside pjit.
- ``model`` — class axis of the ArcFace head W∈ℝ^{512×C} (PartialFC-style
  class sharding; the only model-parallel pressure point in this workload).

Everything else (backbone params, BN stats, optimizer state for them) is
replicated; at IR-100 scale (~65M params) replication is the right call.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crfr.configs import MeshCfg


def make_mesh(cfg: MeshCfg | None = None, devices=None) -> Mesh:
    """Build the (data, model) mesh.

    With no cfg, uses every visible device on the data axis (model=1) — the
    right default for pure-DP training and for single-chip benches.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg is None:
        cfg = MeshCfg(data=n, model=1)
    want = cfg.data * cfg.model
    if want > n:
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {want} devices, have {n}")
    dev = np.asarray(devices[:want]).reshape(cfg.data, cfg.model)
    return Mesh(dev, axis_names=(cfg.axis_data, cfg.axis_model))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) over the FULL mesh (both axes) so pure-DP configs
    with model>1 still use every chip for the backbone."""
    axes = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axes, *([None] * (ndim - 1))))


def class_sharding(mesh: Mesh) -> NamedSharding:
    """ArcFace W (D, C): shard the class axis C over the 'model' mesh axis."""
    return NamedSharding(mesh, P(None, mesh.axis_names[1]))


def host_put(x, sharding: NamedSharding):
    """Place host data with ``sharding``, multi-process-safe.

    Single-process (the common case, incl. single-chip TPU): plain
    ``jax.device_put`` — identical behavior. Multi-process: every host
    passes the same GLOBAL value and materializes only its addressable
    shards via ``jax.make_array_from_callback``. Plain ``device_put`` of
    host data onto a sharding that spans processes instead performs a
    cross-host ``assert_equal`` — a per-call full-array allgather over
    DCN: a bandwidth sink at scale and a deadlock when ranks reach the
    collective >30 s apart (compile-time skew does that routinely).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and getattr(x, "_committed", False):
        return jax.device_put(x, sharding)   # already placed: cheap reshard
    if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys can't round-trip through numpy: place the uint32
        # key data (replicated rng leaves only) and re-wrap
        placed = host_put(np.asarray(jax.random.key_data(x)), sharding)
        return jax.random.wrap_key_data(placed, impl=jax.random.key_impl(x))
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def host_put_local(x, sharding: NamedSharding):
    """Place a PER-PROCESS batch shard: the global array is the concatenation
    of every process's local ``x`` along the sharded (batch) axis.

    ``host_put`` declares the local value as the GLOBAL array (every host
    must pass identical data — replicated-input convention). This variant is
    the data-parallel input convention instead: each host's input pipeline
    draws DISTINCT samples, passes only its own (batch/P)-row slab, and the
    global batch is the concatenation — no cross-host data motion at all.
    Single-process: identical to host_put.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def host_put_tree(tree, sharding: NamedSharding):
    """``host_put`` over every leaf of a pytree (params/opt-state trees)."""
    return jax.tree_util.tree_map(lambda x: host_put(x, sharding), tree)


def maybe_shard_batch(mesh: Mesh | None, images):
    """Place an eval/extract batch for a replicated-weights forward: shard
    axis 0 over the FULL mesh when it divides the device count (GSPMD
    otherwise replicates the whole forward on every device — n_devices×
    redundant compute), else leave placement to jit. One device_put from
    host memory — no intermediate default-device upload."""
    n = int(mesh.devices.size) if mesh is not None else 1
    if n > 1 and int(images.shape[0]) % n == 0:
        return jax.device_put(images, batch_sharding(mesh, getattr(
            images, "ndim", 4)))
    return images


def local_snapshot(tree):
    """Host-local numpy snapshot of a (mostly replicated) state tree, for
    running process-LOCAL programs under multi-controller JAX (e.g. the
    redundant per-host in-training eval).

    Replicated leaves are locally addressable → plain host read. Leaves
    that are NOT fully replicated (the class-sharded ArcFace W) are
    zero-substituted — callers must only run programs that never read
    them (backbone forwards do not). Typed PRNG keys re-wrap through
    ``key_data`` (numpy cannot view the opaque key dtype)."""
    import numpy as np
    import jax.numpy as jnp

    def snap(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                  jax.dtypes.prng_key):
            return jax.random.wrap_key_data(
                np.asarray(jax.random.key_data(x)))
        if getattr(x, "is_fully_replicated", True):
            return np.asarray(x)
        return np.zeros(x.shape, x.dtype)

    return jax.tree_util.tree_map(snap, tree)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays) with batch-axis sharding."""
    def put(x):
        x = np.asarray(x)
        return host_put(x, batch_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (for padding class/batch axes so
    static shapes divide the mesh)."""
    return ((n + m - 1) // m) * m
