"""Structured metrics / logging (SURVEY.md §5: absent in the reference —
here: per-step scalars, edges/s, host-0 logging, optional TensorBoard)."""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Dict, Optional

import jax

__all__ = ["MetricLogger", "host0_logger", "is_host0"]


def is_host0() -> bool:
    return jax.process_index() == 0


def host0_logger(name: str = "graphnets_tpu",
                 level: int = logging.INFO) -> logging.Logger:
    """A logger that emits only on process 0."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level if is_host0() else logging.CRITICAL)
    return logger


class MetricLogger:
    """Collects per-step scalars; reports step time and edges/s; optionally
    writes JSONL and TensorBoard summaries."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None,
                 log_every: int = 100):
        self.log = host0_logger()
        self.log_every = log_every
        self._jsonl = (open(jsonl_path, "a")
                       if jsonl_path and is_host0() else None)
        self._tb = None
        if tensorboard_dir and is_host0():
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self.log.warning("tensorboard writer unavailable")
        self._t_last = None
        self._step_last = 0

    def write(self, step: int, metrics: Dict[str, float],
              edges_per_batch: Optional[int] = None):
        now = time.perf_counter()
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self._t_last is not None and step > self._step_last:
            dt = (now - self._t_last) / (step - self._step_last)
            row["step_time_s"] = dt
            if edges_per_batch:
                row["edges_per_s"] = edges_per_batch / dt
        self._t_last, self._step_last = now, step
        if self._jsonl:
            self._jsonl.write(json.dumps(row) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)
        if self.log_every and step % self.log_every == 0:
            self.log.info(" ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()))

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
