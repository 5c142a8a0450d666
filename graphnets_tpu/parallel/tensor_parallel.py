"""Tensor parallelism: shard large Linear weights over a ``model`` mesh axis.

TPU-native TP is declarative (SURVEY.md §2.3): annotate parameter shardings
with ``NamedSharding`` and let GSPMD insert the activation collectives under
``jit`` — no hand-written all-reduce.  The GN update MLPs
(``FeedForward``: ``[d, 4d]`` / ``[4d, d]``) shard megatron-style: first
matmul column-parallel, second row-parallel, so the only collective is the
reduce at the second matmul's output.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_shardings", "shard_params"]


def param_shardings(params: Any, mesh: Mesh, axis: str = "model",
                    min_size: int = 1 << 14) -> Any:
    """A sharding pytree matching ``params``.

    2-D weights of at least ``min_size`` elements shard their larger matmul
    dim over ``axis`` when divisible: ``[din, dout]`` with ``dout >= din`` ->
    column-parallel ``P(None, axis)``, else row-parallel ``P(axis, None)``.
    Everything else (biases, LN params, small weights) is replicated.
    """
    tp = mesh.shape[axis]

    def rule(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.size >= min_size:
            din, dout = x.shape
            if dout >= din and dout % tp == 0:
                return NamedSharding(mesh, P(None, axis))
            if din % tp == 0:
                return NamedSharding(mesh, P(axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params: Any, mesh: Mesh, axis: str = "model",
                 min_size: int = 1 << 14) -> Any:
    """Place ``params`` according to :func:`param_shardings`."""
    shardings = param_shardings(params, mesh, axis, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
