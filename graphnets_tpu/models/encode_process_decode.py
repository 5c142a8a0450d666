"""Encode -> process (GNCoreList) -> decode model composition.

The reference's example-level ``GNModel``
(``/root/reference/examples/sort/sort.jl:51-81``) promoted to a first-class
library component: encoder GNBlock lifting input dims to core dims, a stack of
residual GNCores, and a decoder GNBlock to output dims.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from ..graph import GraphsTuple
from ..nn.core import Module
from .gn_block import GNBlock
from .gn_core import GNCore, GNCoreList

__all__ = ["EncodeProcessDecode", "GNModel"]


@dataclasses.dataclass(frozen=True)
class EncodeProcessDecode(Module):
    """``GNBlock(x_dims -> core_dims)`` -> ``n_cores * GNCore(core_dims)`` ->
    ``GNBlock(core_dims -> y_dims)``."""

    x_dims: Tuple[int, int, int]
    core_dims: Tuple[int, int, int]
    y_dims: Tuple[int, int, int]
    n_cores: int = 2
    dropout: float = 0.0
    remat: bool = False  # jax.checkpoint each core (memory for FLOPs)

    def _parts(self):
        return (
            GNBlock(self.x_dims, self.core_dims),
            GNCoreList([GNCore(self.core_dims, self.dropout)
                        for _ in range(self.n_cores)], remat=self.remat),
            GNBlock(self.core_dims, self.y_dims),
        )

    def init(self, key: jax.Array):
        ek, ck, dk = jax.random.split(key, 3)
        enc, core, dec = self._parts()
        return {"encoder": enc.init(ek), "core": core.init(ck),
                "decoder": dec.init(dk)}

    def apply(self, params, g: GraphsTuple, *, training: bool = False,
              rng=None) -> GraphsTuple:
        enc, core, dec = self._parts()
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        h = enc.apply(params["encoder"], g, training=training, rng=rngs[0])
        h = core.apply(params["core"], h, training=training, rng=rngs[1])
        return dec.apply(params["decoder"], h, training=training,
                         rng=rngs[2])


GNModel = EncodeProcessDecode
