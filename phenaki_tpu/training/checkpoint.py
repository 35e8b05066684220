"""Checkpoint / resume via Orbax (async-capable sharded checkpointing).

Replaces torch.save/load of packed state dicts (reference
cvivit_trainer.py:176-196, phenaki_trainer.py:323-349). Orbax handles
multi-host sharded arrays natively; saves are coordinated across processes,
so no main-process gating is needed (the reference gates with
is_local_main_process).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    """One-shot pytree save (reference torch.save analog, e.g. standalone
    model weights outside a trainer)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), tree)
    ckptr.wait_until_finished()


def load_pytree(path: str | os.PathLike, template: Any = None) -> Any:
    """One-shot pytree restore (reference CViViT.load analog,
    cvivit.py:431-435)."""
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(Path(path).absolute(), template)
    return ckptr.restore(Path(path).absolute())


def _globalize(tree: Any) -> Any:
    """Multi-process save/restore prep: Orbax refuses host-local jax.Arrays
    (SingleDeviceSharding scalars like step counters / rng keys) in a
    multi-host setting. Such leaves are replicated-by-construction across
    processes (every process computes the same counters), so hand them to
    Orbax as numpy — written once from the primary host, restored everywhere.
    Global (mesh-sharded or cross-host-replicated) arrays pass through and
    are written shard-wise. No-op in single-process runs."""
    if jax.process_count() == 1:
        return tree

    def fix(leaf):
        if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
            return jax.device_get(leaf)
        return leaf

    return jax.tree_util.tree_map(fix, tree)


class CheckpointManager:
    """Thin wrapper: save/restore arbitrary pytrees by integer milestone."""

    def __init__(self, directory: str | os.PathLike, max_to_keep: Optional[int] = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_globalize(state)))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_globalize(template))
            )
        return self._mgr.restore(step)

    def metadata(self, step: Optional[int] = None) -> Any:
        """Checkpoint tree structure WITHOUT loading array data (used for
        layout detection before choosing a restore template)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.item_metadata(step)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
