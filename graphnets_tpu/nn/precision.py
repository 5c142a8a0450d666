"""Mixed-precision policy — bf16 is the MXU-native dtype on TPU.

Policy: parameters are kept in f32 (master weights), compute runs in bf16
(params cast at use — ``Linear.apply`` casts weights to the input dtype),
LayerNorm statistics and all segment accumulations stay f32.  This module
provides the casting helpers that wire a policy through a model.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..graph import GraphsTuple

__all__ = ["Policy", "DEFAULT", "BF16_COMPUTE", "cast_features",
           "cast_params"]


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32

    def cast_graph(self, g: GraphsTuple) -> GraphsTuple:
        return cast_features(g, self.compute_dtype)

    def cast_params(self, params):
        return cast_params(params, self.param_dtype)


DEFAULT = Policy()
BF16_COMPUTE = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


def cast_features(g: GraphsTuple, dtype) -> GraphsTuple:
    """Cast ef/nf/gf to ``dtype`` (structure arrays untouched)."""
    def c(x):
        return None if x is None else x.astype(dtype)
    return g.with_features(ef=c(g.ef), nf=c(g.nf), gf=c(g.gf))


def cast_params(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype")
        and jnp.issubdtype(x.dtype, jnp.floating) else x, params)
