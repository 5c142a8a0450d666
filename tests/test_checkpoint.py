"""Checkpoint / resume round trip (SURVEY.md §5)."""

import numpy as np
import jax
import optax
import pytest

from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.training.checkpoint import CheckpointManager
from graphnets_tpu.training.train import TrainState


def test_checkpoint_roundtrip(tmp_path):
    model = EncodeProcessDecode((0, 8, 0), (16, 16, 16), (2, 2, 0),
                                n_cores=1)
    opt = optax.adamw(1e-3)
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, wait=True)

    # perturb, then restore
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, state)
    restored = mgr.restore(zeroed)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.latest_step() == 0
    mgr.close()


def test_checkpoint_keeps_latest(tmp_path):
    model = EncodeProcessDecode((0, 4, 0), (8, 8, 8), (2, 2, 0), n_cores=1)
    opt = optax.sgd(1e-2)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for step in range(3):
        bumped = TrainState(params=jax.tree_util.tree_map(
            lambda x: x + step, state.params),
            opt_state=state.opt_state, step=state.step + step,
            rng=state.rng)
        mgr.save(step, bumped, wait=True)
    assert mgr.latest_step() == 2
    restored = mgr.restore(state, step=2)
    leaf0 = jax.tree_util.tree_leaves(restored.params)[0]
    orig0 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(leaf0), np.asarray(orig0) + 2)
    mgr.close()
