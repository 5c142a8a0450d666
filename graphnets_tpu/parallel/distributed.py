"""Multi-host runtime: initialization barrier, heartbeat-style liveness,
restartable training, and test-only fault injection (SURVEY.md §5 — the
reference is single-process; these are the TPU-native equivalents).

On a real multi-host TPU slice, ``init_distributed`` wraps
``jax.distributed.initialize`` (coordination service = the barrier /
failure detector: a host that dies drops its heartbeat and peers see RPC
errors).  Recovery model is restart-from-checkpoint: the launcher restarts
the job, ``RestartableLoop`` resumes from the latest Orbax step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterable, Optional, Tuple

import jax

from ..training.checkpoint import CheckpointManager
from ..utils.metrics import host0_logger

__all__ = ["init_distributed", "RestartableLoop", "FaultInjector"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host JAX runtime (no-op single-process).

    Reads the standard env (``JAX_COORDINATOR_ADDRESS`` etc.) when args are
    omitted; returns True when distributed mode is active.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kw = {}
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(coordinator_address, **kw)
    return True


class FaultInjector:
    """Test-only fault hook: kills (or raises in) this process between
    steps, to exercise restart-from-checkpoint recovery."""

    def __init__(self, fail_at_step: Optional[int] = None,
                 mode: str = "raise"):
        self.fail_at_step = fail_at_step
        self.mode = mode

    def maybe_fail(self, step: int):
        if self.fail_at_step is not None and step == self.fail_at_step:
            self.fail_at_step = None
            if self.mode == "raise":
                raise RuntimeError(f"injected fault at step {step}")
            os._exit(42)  # simulated host death


@dataclasses.dataclass
class RestartableLoop:
    """Checkpoint-resumable training loop.

    ``run`` resumes from the latest checkpoint in ``ckpt_dir`` (if any),
    executes ``step_fn(state, batch) -> (state, metrics)`` over ``batches``,
    and checkpoints every ``ckpt_every`` steps.  A crash (or injected fault)
    loses at most ``ckpt_every`` steps of work.
    """

    ckpt_dir: str
    ckpt_every: int = 100
    keep: int = 3
    fault: Optional[FaultInjector] = None

    def run(self, init_state: Any,
            step_fn: Callable[[Any, Any], Tuple[Any, dict]],
            batches: Iterable[Any],
            num_steps: int,
            on_metrics: Optional[Callable[[int, dict], None]] = None) -> Any:
        log = host0_logger()
        mgr = CheckpointManager(self.ckpt_dir, keep=self.keep)
        start = 0
        state = init_state
        if mgr.latest_step() is not None:
            start = int(mgr.latest_step())
            state = mgr.restore(init_state)
            log.info("resumed from checkpoint step %d", start)

        it = iter(batches)
        step = start
        for step in range(start, num_steps):
            batch = next(it)
            if self.fault is not None:
                self.fault.maybe_fail(step)
            state, metrics = step_fn(state, batch)
            if on_metrics is not None:
                on_metrics(step, metrics)
            if (step + 1) % self.ckpt_every == 0 or step + 1 == num_steps:
                mgr.save(step + 1, state, wait=True)
        mgr.wait()
        mgr.close()
        return state
