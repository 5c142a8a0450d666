"""Pipeline parallelism for GNCore stacks (GPipe-style, shard_map+ppermute).

The reference has no PP (SURVEY.md §2.3; GN stacks are shallow), but deep
core stacks at scale want it.  Design: the mesh's ``pipe`` axis holds S
stages, each owning ``len(cores)/S`` consecutive GNCores (stacked params,
leading stage dim sharded).  Microbatches stream through: at tick ``t``
stage ``s`` processes microbatch ``m = t - s``; only the *features* rotate
between stages via ``ppermute`` over ICI — graph structure is replicated, so
each stage reads microbatch ``m``'s structure locally.  Bubble fraction is
``(S-1)/(M+S-1)``.

Implemented with ``lax.scan`` over ticks (reverse-differentiable, so the
pipeline trains).  Verified == the sequential GNCoreList on every
microbatch.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import GraphsTuple
from ..models.gn_core import GNCore, GNCoreList

__all__ = ["PipelinedCoreList"]


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


@dataclasses.dataclass(frozen=True)
class PipelinedCoreList:
    """``GNCoreList`` split into ``num_stages`` pipeline stages.

    ``init(key)`` returns params with a leading stage axis (shard it over
    the ``pipe`` mesh axis with ``P("pipe")``).  ``apply(params, micros,
    mesh)`` takes a *stacked* batch of M microbatch GraphsTuples (identical
    pad sizes, leading axis M) and returns the stacked outputs.
    """

    cores: Tuple[GNCore, ...]
    num_stages: int
    axis: str = "pipe"

    def __post_init__(self):
        assert len(self.cores) % self.num_stages == 0, (
            "cores must divide evenly into stages")
        dims = {c.dims for c in self.cores}
        assert len(dims) == 1, "pipeline stages must share dims"

    @property
    def cores_per_stage(self) -> int:
        return len(self.cores) // self.num_stages

    def init(self, key: jax.Array):
        k = self.cores_per_stage
        keys = jax.random.split(key, len(self.cores))
        stages = []
        for s in range(self.num_stages):
            stages.append({str(i): self.cores[s * k + i].init(
                keys[s * k + i]) for i in range(k)})
        return _stack(stages)

    def sequential(self) -> GNCoreList:
        """The equivalent unpipelined module (same param layout per stage)."""
        return GNCoreList(list(self.cores))

    def apply(self, params, micros: GraphsTuple, mesh: Mesh) -> GraphsTuple:
        S = self.num_stages
        k = self.cores_per_stage
        cores = self.cores
        axis = self.axis
        M = int(micros.ef.shape[0] if micros.ef is not None
                else micros.nf.shape[0])

        feats_of = lambda g: (g.ef, g.nf, g.gf)

        def stage_fn(stage_params, g: GraphsTuple) -> GraphsTuple:
            for i in range(k):
                g = cores[i].apply(stage_params[str(i)], g)
            return g

        def local(params, micros):
            stage_params = jax.tree_util.tree_map(lambda x: x[0], params)
            sid = jax.lax.axis_index(axis)

            def micro_at(m):
                return jax.tree_util.tree_map(lambda x: x[m], micros)

            zero_feats = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x[0]), feats_of(micros))
            out0 = jax.tree_util.tree_map(jnp.zeros_like, feats_of(micros))

            def tick(carry, t):
                buf, out = carry
                m = jnp.clip(t - sid, 0, M - 1)
                g_m = micro_at(m)
                # stage 0 ingests fresh features; others use the rotated buf
                feats = jax.tree_util.tree_map(
                    lambda fresh, b: jnp.where(sid == 0, fresh, b),
                    feats_of(g_m), buf)
                g_in = g_m.with_features(ef=feats[0], nf=feats[1],
                                         gf=feats[2])
                y = stage_fn(stage_params, g_in)
                y_feats = feats_of(y)
                # rotate features to the next stage
                perm = [(s, (s + 1) % S) for s in range(S)]
                nxt = jax.tree_util.tree_map(
                    lambda v: jax.lax.ppermute(v, axis, perm), y_feats)
                # last stage records microbatch m's output
                write = (sid == S - 1) & (t >= S - 1) & (t - sid < M)
                out = jax.tree_util.tree_map(
                    lambda o, v: o.at[m].set(
                        jnp.where(write, v, o[m])), out, y_feats)
                return (nxt, out), None

            (_, out), _ = jax.lax.scan(tick, (zero_feats, out0),
                                       jnp.arange(M + S - 1))
            # outputs live on the last stage; broadcast to all
            out = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(
                    jnp.where(sid == S - 1, x, jnp.zeros_like(x)), axis),
                out)
            return out

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(self.axis), P()),
            out_specs=P(),
            check_vma=False,
        )
        ef, nf, gf = fn(params, micros)
        return micros.with_features(ef=ef, nf=nf, gf=gf)
