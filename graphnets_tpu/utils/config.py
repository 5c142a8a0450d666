"""Global framework configuration (the reference has none — SURVEY.md §5;
hyperparameters live in constructors, runtime switches live here)."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # Use Pallas TPU kernels on the hot paths (pure-JAX path remains the
    # numerics oracle and the fallback for unsupported shapes/backends).
    use_pallas: bool = False
    # Run Pallas kernels in interpreter mode (CPU debugging/testing).
    pallas_interpret: bool = False
    # Compute GNBlock update nets as per-segment split matmuls with
    # gather-after-transform (transform node/global features at N/G rows,
    # then gather to E edge slots) instead of materializing the concatenated
    # input.  Mathematically identical (same per-row dot products; partial
    # sums accumulate in f32); at avg degree 16 it cuts edge-update FLOPs
    # ~3.5x and removes the [E, DE+2DN+DG] concat from HBM.
    split_linear: bool = True
    # Run the backward scatter-add of node gathers SORTED (argsort the
    # cotangent rows once, reduce with the sorted-segment-sum kernel)
    # instead of XLA's serial scatter.
    sorted_scatter_grad: bool = True
    # Debug-mode invariant checks (GRAPHNETS_TPU_DEBUG=1): structural
    # validation in batch(), and sortedness / pad-targets-pad enforcement
    # in segment_sum(sorted_pad_safe=True) — the precondition the Pallas
    # kernel's mask-free design depends on.  Violations raise instead of
    # silently corrupting results.
    debug_checks: bool = False


_config = Config(
    use_pallas=os.environ.get("GRAPHNETS_TPU_PALLAS", "auto") == "1",
    pallas_interpret=os.environ.get("GRAPHNETS_TPU_PALLAS_INTERPRET",
                                    "0") == "1",
    split_linear=os.environ.get("GRAPHNETS_TPU_SPLIT_LINEAR", "1") == "1",
    debug_checks=os.environ.get("GRAPHNETS_TPU_DEBUG", "0") == "1",
)

# Default: off.  Measured on v5e, the 3-core stack at D=384 is FLOP-bound and
# XLA reaches ~86% of peak on the LN->FFN->residual chain, so the fused
# kernel buys nothing there (it matches, 228us vs 228us per FF-edges pass)
# while adding compile time.  Enable with GRAPHNETS_TPU_PALLAS=1 for
# bandwidth-bound configs (small D) — the kernel is parity-tested either way.


def get_config() -> Config:
    return _config


def use_pallas() -> bool:
    return _config.use_pallas


def use_split_linear() -> bool:
    return _config.split_linear


def enable_pallas(flag: bool = True, interpret: Optional[bool] = None):
    _config.use_pallas = flag
    if interpret is not None:
        _config.pallas_interpret = interpret


def debug_checks() -> bool:
    return _config.debug_checks


def enable_debug_checks(flag: bool = True):
    _config.debug_checks = flag
