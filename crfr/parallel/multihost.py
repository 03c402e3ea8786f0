"""Multi-host (DCN) initialization for the MS1M-scale config
(SURVEY.md §5.8: "multi-host (DCN) via jax.distributed.initialize").

One call at program start per host; afterwards the SAME mesh/sharding code
runs unchanged — `jax.devices()` spans all hosts, `make_mesh` lays the
(data, model) axes across them, per-host data loading uses
`process_index`-strided sharding of the record index space.

Untestable on this 1-chip sandbox (documented in PARITY.md); the logic is
env-driven and inert on single host.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize JAX distributed from env if a multi-host launch is
    detected. Returns True if distributed mode is active.

    Recognized env (standard TPU-pod / manual conventions):
      CRFR_COORDINATOR   host:port of process 0 (or JAX_COORDINATOR_ADDRESS)
      CRFR_NUM_PROCESSES total process count   (or JAX_NUM_PROCESSES)
      CRFR_PROCESS_ID    this process's id     (or JAX_PROCESS_ID)
    On Cloud TPU pods with no env set, jax.distributed.initialize() without
    args auto-discovers; we only call it when multi-host env is present so
    single-host runs never touch the distributed runtime.
    """
    import jax

    coord = os.environ.get("CRFR_COORDINATOR",
                           os.environ.get("JAX_COORDINATOR_ADDRESS"))
    nproc = os.environ.get("CRFR_NUM_PROCESSES",
                           os.environ.get("JAX_NUM_PROCESSES"))
    pid = os.environ.get("CRFR_PROCESS_ID", os.environ.get("JAX_PROCESS_ID"))
    if coord is None or nproc is None or pid is None:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    except RuntimeError as e:
        # idempotent: a launcher (or test worker) may have initialized
        # already before handing control to a CLI entry point
        if "already" not in str(e).lower():
            raise
    return True


def process_shard(n: int) -> tuple[int, int]:
    """(start, stop) of this host's contiguous shard of n dataset indices."""
    import jax

    p = jax.process_index()
    np_ = jax.process_count()
    per = n // np_
    extra = n % np_
    start = p * per + min(p, extra)
    stop = start + per + (1 if p < extra else 0)
    return start, stop
