"""Checkpoint / resume via Orbax (SURVEY.md §5: absent in the reference —
model state there is an in-memory Functors tree; JAX pytrees are the direct
analogue, serialized with Orbax)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint"]


class CheckpointManager:
    """Thin wrapper around ``ocp.CheckpointManager`` for TrainState pytrees.

    Saves params + optimizer state + step + rng; ``restore`` resumes from the
    latest step.  Use ``keep`` to bound disk usage.
    """

    def __init__(self, directory: str, keep: int = 3,
                 save_interval_steps: int = 1):
        assert _HAS_ORBAX, "orbax-checkpoint is required"
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_interval_steps),
        )

    @staticmethod
    def _encode(tree):
        # Orbax refuses zero-size arrays; zero feature dims are legal in GN
        # params (``/root/reference/src/gnblock.jl:48-49``) — swap them for a
        # 1-element sentinel and restore the true shape from the abstract
        # state on load.
        def enc(x):
            x = np.asarray(x)
            return x if x.size else np.zeros((1,), x.dtype)
        return jax.tree_util.tree_map(enc, tree)

    @staticmethod
    def _decode(abstract, restored):
        def dec(a, x):
            a = np.asarray(a)
            return x if a.size else np.zeros(a.shape, a.dtype)
        return jax.tree_util.tree_map(dec, abstract, restored)

    def save(self, step: int, state: Any, wait: bool = False) -> bool:
        saved = self._mgr.save(
            step,
            args=ocp.args.StandardSave(self._encode(jax.device_get(state))))
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        abstract = jax.device_get(abstract_state)
        target = self._encode(abstract)
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        return self._decode(abstract, restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_checkpoint(directory: str, step: int, state: Any):
    mgr = CheckpointManager(directory)
    mgr.save(step, state, wait=True)
    mgr.close()


def restore_checkpoint(directory: str, abstract_state: Any,
                       step: Optional[int] = None) -> Any:
    mgr = CheckpointManager(directory)
    out = mgr.restore(abstract_state, step)
    mgr.close()
    return out
