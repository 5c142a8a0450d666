"""Restart-from-checkpoint recovery with fault injection (SURVEY.md §5),
plus debug/validation guards."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import graphnets_tpu as gn
from graphnets_tpu.data.sort_task import SortTaskConfig, get_batch, \
    sort_pad_spec
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.parallel.distributed import (FaultInjector,
                                                RestartableLoop)
from graphnets_tpu.training.train import TrainState, make_train_step
from graphnets_tpu.utils.debug import assert_finite, checked, validate_graph


def _setup():
    cfg = SortTaskConfig(vocab_size=6, min_nodes=2, max_nodes=3,
                         batch_size=2)
    model = EncodeProcessDecode((0, cfg.vocab_size, 0), (8, 8, 8),
                                (2, 2, 0), n_cores=1)
    opt = optax.sgd(1e-2)
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, opt))
    pad = sort_pad_spec(cfg)

    def batches(seed=0):
        rng = np.random.default_rng(seed)
        while True:
            yield get_batch(rng, cfg, pad)

    return state, step, batches


def test_restart_recovers_and_matches(tmp_path):
    """Crash at step 7, restart, resume from checkpoint at 5, finish: final
    state must equal an uninterrupted run over the same data stream keyed by
    step (batches are deterministic per step index here)."""
    state0, step_fn, batches = _setup()

    def wrapped(state, batch):
        x, y = batch
        return step_fn(state, x, y)

    # Batch stream must be reproducible from any resume point: generate all
    # batches up front and index by step.
    all_batches = []
    gen = batches(seed=1)
    for _ in range(12):
        all_batches.append(next(gen))

    def stream(from_step):
        return iter(all_batches[from_step:])

    ckpt = str(tmp_path / "ckpt")
    loop = RestartableLoop(ckpt_dir=ckpt, ckpt_every=5,
                           fault=FaultInjector(fail_at_step=7))
    with pytest.raises(RuntimeError, match="injected fault"):
        loop.run(state0, wrapped, stream(0), num_steps=12)

    # restart: loop resumes at the checkpointed step (5)
    loop2 = RestartableLoop(ckpt_dir=ckpt, ckpt_every=5)
    final = loop2.run(state0, wrapped, stream(5), num_steps=12)

    # uninterrupted reference
    ref_state = state0
    for b in all_batches:
        ref_state, _ = wrapped(ref_state, b)

    for a, b in zip(jax.tree_util.tree_leaves(final.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # nan for negative input

    f = checked(bad)
    f(jnp.ones((4,)))  # fine
    with pytest.raises(Exception):
        f(-jnp.ones((4,)))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, float("nan")])}, "bad")


def test_validate_graph():
    adj = np.array([[1, 0], [1, 1]])
    g = gn.batch({"graphs": [adj], "ef": None,
                  "nf": [np.zeros((2, 3), np.float32)], "gf": None},
                 pad=gn.PadSpec(4, 8, 2))
    validate_graph(g)
    # corrupt: a real edge pointing at a padded node
    import dataclasses
    bad = g.replace(senders=g.senders.at[0].set(3))
    with pytest.raises(AssertionError):
        validate_graph(bad)
