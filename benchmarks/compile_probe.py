#!/usr/bin/env python
"""Where do the flagship's 16 compile-minutes go? (RESULTS.md 'compile
time' paragraph).

The 20k-step flagship spends ~1000 s compiling ONE train-chunk program and
~14 s running it.  The same HLO (6297 lines, chunk-length independent)
compiles in 6.5 s on CPU XLA — so the cost is in the TPU backend.  This
probe times ``.lower()`` / ``.compile()`` on the chip for the suspects:

  fwd_only        forward + loss (no backward)
  train_sorted    full train step, sorted-gather/scatter grads (default)
  train_xla_scat  full train step, XLA serial-scatter grads
                  (GRAPHNETS_TPU_PALLAS=0 + sorted_scatter_grad=False)
"""

import sys, time, functools
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from graphnets_tpu.training.train import make_train_step, TrainState
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.data.sort_task import (SortTaskConfig, sort_pad_spec,
                                          device_batch)
from graphnets_tpu.training.losses import graph_loss_nf_ef
from graphnets_tpu.utils.config import get_config, enable_pallas

cfg = SortTaskConfig()
pad = sort_pad_spec(cfg)
model = EncodeProcessDecode(x_dims=(0, cfg.vocab_size, 0),
                            core_dims=(384,) * 3, y_dims=(2, 2, 0),
                            n_cores=2)
opt = optax.adamw(3e-4)
state = TrainState.create(model, opt, jax.random.PRNGKey(0))


def probe(name, fn, arg):
    t0 = time.perf_counter()
    low = fn.lower(arg)
    t1 = time.perf_counter()
    low.compile()
    t2 = time.perf_counter()
    print(f"{name:16s} trace+lower {t1-t0:6.1f}s  compile {t2-t1:7.1f}s",
          flush=True)


def fwd_body(state, _):
    rng, dk = jax.random.split(state.rng)
    state = TrainState(params=state.params, opt_state=state.opt_state,
                       step=state.step, rng=rng)
    x, y = device_batch(dk, cfg, pad, dtype=None)
    loss = graph_loss_nf_ef(model.apply(state.params, x), y)
    return state, loss


@jax.jit
def run_fwd(state):
    state, ls = jax.lax.scan(fwd_body, state, None, length=100)
    return jnp.sum(ls)


def make_chunk():
    step_core = make_train_step(model, opt)

    def body(state, _):
        rng, dk = jax.random.split(state.rng)
        state = TrainState(params=state.params, opt_state=state.opt_state,
                           step=state.step, rng=rng)
        x, y = device_batch(dk, cfg, pad, dtype=None)
        return step_core(state, x, y)

    @jax.jit
    def run_chunk(state):
        state, ms = jax.lax.scan(body, state, None, length=100)
        return state, jax.tree_util.tree_map(jnp.mean, ms)

    return run_chunk


probe("fwd_only", run_fwd, state)

enable_pallas(True)
get_config().sorted_scatter_grad = True
probe("train_sorted", make_chunk(), state)

enable_pallas(False)
get_config().sorted_scatter_grad = False
probe("train_xla_scat", make_chunk(), state)
