"""Compilation-cache + warmup utilities — the TPU analogue of the
reference's SnoopPrecompile startup-latency optimization
(``/root/reference/src/other/precompile.jl:3-106``).

Julia pays compile latency at package load; XLA pays it at first trace.  Two
mitigations: a persistent on-disk compilation cache (subsequent processes
reuse compiled executables) and an explicit warmup that traces the standard
entry points once.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax

__all__ = ["enable_compilation_cache", "warmup"]


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or os.environ.get(
        "GRAPHNETS_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "graphnets_tpu",
                     "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return cache_dir


def warmup(dims: Tuple[int, int, int] = (16, 16, 16),
           n_cores: int = 1) -> None:
    """Trace + compile a GNBlock and a GNCore forward on tiny shapes so the
    first real step doesn't pay full compile latency (mirrors what the
    reference precompiles: both batch modes + block/core forward)."""
    import jax.numpy as jnp

    from .. import GNBlock, GNCore, batch, PadSpec

    adj = np.array([[1, 0], [1, 1]])
    de, dn, dg = dims
    rng = np.random.default_rng(0)
    x = batch({
        "graphs": [adj, adj],
        "ef": [rng.normal(size=(3, de)).astype(np.float32)] * 2,
        "nf": [rng.normal(size=(2, dn)).astype(np.float32)] * 2,
        "gf": np.zeros((2, dg), np.float32),
    }, pad=PadSpec(8, 8, 3))
    block = GNBlock(dims, dims)
    params = block.init(jax.random.PRNGKey(0))
    jax.jit(block.apply)(params, x).nf.block_until_ready()
    core = GNCore(dims)
    cparams = core.init(jax.random.PRNGKey(1))
    jax.jit(core.apply)(cparams, x).nf.block_until_ready()
