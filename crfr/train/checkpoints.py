"""Checkpoint/resume — async, sharding-aware Orbax (SURVEY.md §5.3/§5.4).

Replaces the reference's per-epoch ``torch.save({'backbone':…,'head':…})``
with Orbax: async writes off the critical path, restore that re-lays every
leaf onto its original NamedSharding (the class-sharded ArcFace W comes back
sharded), N-latest retention, and the config serialized next to the state so
a checkpoint is self-describing. Resume is idempotent: the step counter rides
in the state and the data pipeline / dropout rngs are re-derived from it
(crfr/train/loop.py rng discipline), giving preemption tolerance on TPU pods.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any, config_json: str | None = None,
             force: bool = False) -> bool:
        composite = {"state": ocp.args.StandardSave(state)}
        if config_json is not None:
            composite["config"] = ocp.args.JsonSave(json.loads(config_json))
        return self.mgr.save(step, args=ocp.args.Composite(**composite),
                             force=force)

    def restore(self, target_state: Any, step: int | None = None) -> Any:
        """Restore into the layout of ``target_state`` (same pytree, same
        shardings — leaves come back on the same mesh placement)."""
        if step is None:
            step = self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x,
            target_state)
        out = self.mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract)))
        return out["state"]

    def state_keys(self, step: int | None = None) -> list[str] | None:
        """Top-level keys of the stored state tree (None if unreadable).
        Lets callers do format-tolerant partial restores: build the restore
        template from the INTERSECTION with their live state_dict so adding
        new optional keys (e.g. SRTrainer g_ema/meta) never breaks loading
        older checkpoints."""
        if step is None:
            step = self.mgr.latest_step()
        if step is None:
            return None
        try:
            md = self.mgr.item_metadata(step)
            return list(md.state.keys())
        except Exception:
            return None

    def restore_config(self, step: int | None = None) -> dict | None:
        if step is None:
            step = self.mgr.latest_step()
        if step is None:
            return None
        try:
            out = self.mgr.restore(step, args=ocp.args.Composite(
                config=ocp.args.JsonRestore()))
            return out["config"]
        except Exception:
            return None

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
