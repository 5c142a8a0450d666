#!/usr/bin/env python
"""Minimal repro: sorted_segment_sum f32 miscompile on real TPU."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from graphnets_tpu.utils.config import enable_pallas
enable_pallas(True)
from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum

rng = np.random.default_rng(0)
E, N, D = 16384, 1024, 384
seg = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
out = np.asarray(jax.jit(lambda x: sorted_segment_sum(x, seg, N))(x))
ref = np.asarray(jax.ops.segment_sum(x, seg, num_segments=N,
                                     indices_are_sorted=True))
err = np.abs(out - ref)
rel = err / np.maximum(np.abs(ref), 1e-3)
print("max abs err", err.max(), "max rel", rel.max())
bad_rows = np.where(err.max(axis=1) > 1e-2)[0]
print("bad rows:", len(bad_rows), bad_rows[:40])
bad_cols = np.where(err.max(axis=0) > 1e-2)[0]
print("bad cols:", len(bad_cols), bad_cols[:40])
if len(bad_rows):
    r = bad_rows[0]
    print("row", r, "out[:6]", out[r, :6], "ref[:6]", ref[r, :6])
    # is out row all zeros? or doubled? or from another row?
    print("zeros?", np.allclose(out[r], 0),
          "doubled?", np.allclose(out[r], 2 * ref[r], atol=1e-2))
