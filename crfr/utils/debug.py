"""Debug-mode switches (SURVEY.md §5.2 — the functional-world analog of race
detectors/sanitizers): NaN trapping, transfer guarding, Pallas interpreter
forcing, leak checking. Everything is opt-in and composable.

    with debug_mode(nans=True):
        trainer.train_step(...)        # any NaN in any jitted op raises
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = False,
               disable_jit: bool = False, log_compiles: bool = False):
    """Context: enable jax debug facilities, restore previous state after."""
    updates = {}
    if nans:
        updates["jax_debug_nans"] = True
    if infs:
        updates["jax_debug_infs"] = True
    if disable_jit:
        updates["jax_disable_jit"] = True
    if log_compiles:
        updates["jax_log_compiles"] = True
    prev = {k: getattr(jax.config, k) for k in updates}
    try:
        for k, v in updates.items():
            jax.config.update(k, v)
        yield
    finally:
        for k, v in prev.items():
            jax.config.update(k, v)


@contextlib.contextmanager
def pallas_interpret():
    """Force all Pallas kernels through the interpreter (kernel correctness
    triage without Mosaic in the loop)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@contextlib.contextmanager
def no_host_transfers():
    """Raise on implicit device→host transfers inside the context — catches
    accidental syncs on the training hot path. (Host→device stays allowed:
    python scalars in jitted exprs are routine.)"""
    with jax.transfer_guard_device_to_host("disallow"):
        yield
