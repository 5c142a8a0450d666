#!/usr/bin/env python
"""Sender-gather experiment (round 5): per-row-DMA Pallas random gather
vs XLA's dynamic take on the large-graph shape (E=1M, D=256, N=65536,
bf16 — 512 B rows, uniformly random ids).

Context: the r4 ablation pinned ~4.7 ms/core on this gather vs a ~1.3 ms
STREAMING-roofline floor.  This experiment provides an independent second
implementation of the same random access pattern; if both land in the
same band, that band is the random-row HBM capability, not XLA slack.
"""

import sys
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from graphnets_tpu.utils.config import enable_pallas
from graphnets_tpu.utils.warmup import enable_compilation_cache

enable_compilation_cache()
enable_pallas(True)

from bench import time_iterated  # noqa: E402

D, E = 256, 1 << 20
DT = jnp.bfloat16

from graphnets_tpu.ops.pallas.random_gather import (random_gather,
                                                    supports_random_gather)

rng = np.random.default_rng(0)
for N in (65536, 1 << 20):
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), DT)
    idx = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    assert supports_random_gather(E, N, D)

    # carry the table (output feeds back via a cheap mix so the gather
    # cannot be hoisted out of the scan)
    def step_take(tab):
        out = jnp.take(tab, idx, axis=0, mode="clip")
        return tab + out[:tab.shape[0]] * jnp.bfloat16(1e-6)

    def step_rg(tab):
        out = random_gather(tab, idx)
        return tab + out[:tab.shape[0]] * jnp.bfloat16(1e-6)

    t_take = time_iterated(step_take, table, l1=3, l2=24)
    print(f"N={N}: xla take:       {t_take*1e3:.3f} ms  "
          f"{2*E*D*2/t_take/1e9:.0f} GB/s eff", flush=True)
    try:
        t_rg = time_iterated(step_rg, table, l1=3, l2=24)
        print(f"N={N}: pallas per-row: {t_rg*1e3:.3f} ms  "
              f"{2*E*D*2/t_rg/1e9:.0f} GB/s eff", flush=True)
        print(f"N={N}: ratio rg/take = {t_rg/t_take:.2f}", flush=True)
    except Exception as e:
        # Expected on real TPU: Mosaic's DMA granularity is one (8,128)
        # tile, so a single-row slice of a tiled memref is not legal —
        # per-row random DMA is architecturally unexpressible.  The
        # kernel runs in interpret mode (tests) as the semantic spec; on
        # hardware any Pallas formulation pays >=8x (f32) / 16x (bf16)
        # row-group amplification, i.e. >= ~5 ms of raw traffic — above
        # XLA's measured take.  This records the negative result.
        msg = str(e).splitlines()[0][:200]
        print(f"N={N}: pallas per-row: REJECTED by Mosaic ({msg})",
              flush=True)
