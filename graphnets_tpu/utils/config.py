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
    # None = "auto": resolve to True iff the default backend is a TPU,
    # decided lazily on first query (so importing the package never forces
    # backend initialization).
    use_pallas: Optional[bool] = None
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
    # Round the partial products of GATHERED split-linear terms to bf16
    # before the E-row gather (models/gn_block._linear_split).  Halves the
    # dominant HBM streams of the non-uniform edge update at large E at the
    # cost of <=3 extra bf16 roundings per output element vs the concat
    # formulation's single rounding (only bf16 inputs are affected; f32
    # partials always gather in f32).  None = "auto": on when the gather
    # writes >= bf16_gather_rows rows, where the op is bandwidth-bound.
    bf16_gather_partials: Optional[bool] = None
    bf16_gather_rows: int = 1 << 17
    # Engage the G=1 agg-fused edge-update kernel inside TRAINING graphs
    # too (it is always preferred in inference where supported — measured
    # win).  Under training its backward adds a gather of the agg cotangent
    # on top of the fused kernel's own adjoint; whether that pays for the
    # saved [E, dout] re-read is decided from measurement, like the G>=2
    # gate (models/gn_block.py); see benchmarks/RESULTS.md for the
    # measurements that set this default.  Re-validated r5b after the
    # sort_key_val backward-permute optimization at E=1M/D=256: fused
    # still wins both paths (single-device 171.86 vs composed 177.97 ms;
    # partitioned shards 177.05 vs 220.45 ms).
    # GRAPHNETS_TPU_G1_AGG_TRAIN=0/1 overrides.
    g1_agg_fusion_training: bool = True
    # Debug-mode invariant checks (GRAPHNETS_TPU_DEBUG=1): structural
    # validation in batch(), and sortedness / pad-targets-pad enforcement
    # in segment_sum(sorted_pad_safe=True) — the precondition the Pallas
    # kernel's mask-free design depends on.  Violations raise instead of
    # silently corrupting results.
    debug_checks: bool = False


def _env_pallas() -> Optional[bool]:
    v = os.environ.get("GRAPHNETS_TPU_PALLAS", "auto").lower()
    if v in ("auto", ""):
        return None
    return v == "1"


def _env_tristate(name: str) -> Optional[bool]:
    v = os.environ.get(name, "auto").lower()
    if v in ("auto", ""):
        return None
    return v == "1"


_config = Config(
    use_pallas=_env_pallas(),
    pallas_interpret=os.environ.get("GRAPHNETS_TPU_PALLAS_INTERPRET",
                                    "0") == "1",
    split_linear=os.environ.get("GRAPHNETS_TPU_SPLIT_LINEAR", "1") == "1",
    g1_agg_fusion_training=os.environ.get(
        "GRAPHNETS_TPU_G1_AGG_TRAIN", "1") == "1",
    bf16_gather_partials=_env_tristate("GRAPHNETS_TPU_BF16_GATHER"),
    debug_checks=os.environ.get("GRAPHNETS_TPU_DEBUG", "0") == "1",
)

# Measured on v5e (benchmarks/RESULTS.md): the Pallas sorted-segment-sum and
# fused SDDMM edge-update kernels are worth ~30% of the 3-core forward at
# D=384, so "auto" turns them ON whenever the default backend is a TPU.
# Per-shape fallbacks to the pure-XLA oracle path remain in every kernel
# entry point; GRAPHNETS_TPU_PALLAS=0/1 forces either mode.


def get_config() -> Config:
    return _config


def _backend_is_tpu() -> bool:
    import jax
    try:
        if jax.default_backend() == "tpu":
            return True
        # Tunneled / plugin TPU backends register under other platform
        # names (e.g. "axon") — detect by device kind.
        return any("tpu" in d.device_kind.lower()
                   for d in jax.devices())
    except Exception:
        return False


def use_pallas() -> bool:
    if _config.use_pallas is None:
        _config.use_pallas = _backend_is_tpu()
    return _config.use_pallas


def use_split_linear() -> bool:
    return _config.split_linear


def enable_pallas(flag: bool = True, interpret: Optional[bool] = None):
    _config.use_pallas = flag
    if interpret is not None:
        _config.pallas_interpret = interpret


_bf16_gate_logged = False


def bf16_gather_partials(rows: int) -> bool:
    if _config.bf16_gather_partials is None:
        on = rows >= _config.bf16_gather_rows
        if on:
            # The auto gate keys on the padded gather row count, so two
            # runs of the same model with different padding can differ in
            # rounding behavior with no other signal — log the first
            # engagement so the numerics change is visible.
            global _bf16_gate_logged
            if not _bf16_gate_logged:
                _bf16_gate_logged = True
                import logging
                logging.getLogger("graphnets_tpu").info(
                    "bf16_gather_partials auto-enabled (gather rows %d >= "
                    "%d): split-linear partials round to bf16 before the "
                    "edge gather; set GRAPHNETS_TPU_BF16_GATHER=0/1 to pin.",
                    rows, _config.bf16_gather_rows)
        return on
    return _config.bf16_gather_partials


def g1_agg_fusion_training() -> bool:
    return _config.g1_agg_fusion_training


def debug_checks() -> bool:
    return _config.debug_checks


def enable_debug_checks(flag: bool = True):
    _config.debug_checks = flag
