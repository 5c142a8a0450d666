"""GNCore / GNCoreList / GNFeedForward / GNGraphNorm.

Reference: ``/root/reference/src/gncore.jl``, ``gncorelist.jl``,
``gnfeedforward.jl``, ``gngraphnorm.jl``.

The core is a transformer-style **parallel-branch** residual (both branches
read the original input, GPT-J style — not sequential pre-norm;
``/root/reference/src/gncore.jl:56-59``):

    y = x + GNBlock(LN1(x)) + FFW(LN2(x))

where LN is per-feature-set LayerNorm over channels, FFW is a per-feature-set
``Dense(d -> 4d, relu) -> Dense(4d -> d) -> Dropout`` MLP, and all three
feature dims must be > 0 (``/root/reference/src/gnfeedforward.jl:18``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax

from ..graph import GraphsTuple
from ..nn.core import Dropout, FeedForward, LayerNorm, Module
from .gn_block import GNBlock

__all__ = ["GNFeedForward", "GNGraphNorm", "GNCore", "GNCoreList",
           "graphnet_add"]


def _require_all_positive(dims, who: str):
    """Residual cores normalize and MLP every feature set, so all three
    dims must be > 0 — the reference enforces this via GNFeedForward's
    ``@assert all(dims .> 0)`` (``/root/reference/src/gnfeedforward.jl:18``);
    we raise at construction with the rule spelled out instead of letting
    an inner assert fail later."""
    if not all(d > 0 for d in dims):
        raise ValueError(
            f"{who} requires all of (edge, node, graph) dims > 0, got "
            f"{tuple(dims)}. Residual cores LayerNorm + MLP every feature "
            "set (reference rule: /root/reference/src/gnfeedforward.jl:18)."
            " Use GNBlock directly for zero-width feature sets.")


def graphnet_add(a: GraphsTuple, b: GraphsTuple) -> GraphsTuple:
    """Element-wise residual add of ef/nf/gf
    (``/root/reference/src/gncore.jl:61-68``)."""
    return a.with_features(ef=a.ef + b.ef, nf=a.nf + b.nf, gf=a.gf + b.gf)


@dataclasses.dataclass(frozen=True)
class GNGraphNorm(Module):
    """Per-feature-set LayerNorm (``/root/reference/src/gngraphnorm.jl:9-25``).

    Note: like the reference, padded slots get normalised too (LN of zeros =
    bias); this never leaks into real slots because aggregations mask padding.
    """

    dims: Tuple[int, int, int]

    def __post_init__(self):
        _require_all_positive(self.dims, "GNGraphNorm")

    def _lns(self):
        de, dn, dg = self.dims
        return LayerNorm(de), LayerNorm(dn), LayerNorm(dg)

    def init(self, key):
        ek, nk, gk = jax.random.split(key, 3)
        eln, nln, gln = self._lns()
        return {"edgeln": eln.init(ek), "nodeln": nln.init(nk),
                "graphln": gln.init(gk)}

    def apply(self, params, g: GraphsTuple, *, training=False, rng=None):
        eln, nln, gln = self._lns()
        return g.with_features(
            ef=eln.apply(params["edgeln"], g.ef),
            nf=nln.apply(params["nodeln"], g.nf),
            gf=gln.apply(params["graphln"], g.gf),
        )


@dataclasses.dataclass(frozen=True)
class GNFeedForward(Module):
    """Per-feature-set MLP (``/root/reference/src/gnfeedforward.jl:17-39``)."""

    dims: Tuple[int, int, int]
    dropout: float = 0.0

    def __post_init__(self):
        _require_all_positive(self.dims, "GNFeedForward")

    def _ffs(self):
        de, dn, dg = self.dims
        return (FeedForward(de, self.dropout), FeedForward(dn, self.dropout),
                FeedForward(dg, self.dropout))

    def init(self, key):
        ek, nk, gk = jax.random.split(key, 3)
        eff, nff, gff = self._ffs()
        return {"eff": eff.init(ek), "nff": nff.init(nk),
                "gff": gff.init(gk)}

    def apply(self, params, g: GraphsTuple, *, training=False, rng=None):
        eff, nff, gff = self._ffs()
        rngs = (jax.random.split(rng, 3) if rng is not None
                else (None, None, None))
        return g.with_features(
            ef=eff.apply(params["eff"], g.ef, training=training, rng=rngs[0]),
            nf=nff.apply(params["nff"], g.nf, training=training, rng=rngs[1]),
            gf=gff.apply(params["gff"], g.gf, training=training, rng=rngs[2]),
        )


@dataclasses.dataclass(frozen=True)
class GNCore(Module):
    """Residual GN core at constant dims
    (``/root/reference/src/gncore.jl:46-59``)."""

    dims: Tuple[int, int, int]
    dropout: float = 0.0

    def __post_init__(self):
        _require_all_positive(self.dims, "GNCore")

    def _parts(self):
        return (GNBlock(self.dims, self.dims, dropout=self.dropout),
                GNFeedForward(self.dims, self.dropout),
                GNGraphNorm(self.dims), GNGraphNorm(self.dims))

    def init(self, key):
        bk, fk, n1k, n2k = jax.random.split(key, 4)
        block, ffwd, gn1, gn2 = self._parts()
        return {"block": block.init(bk), "ffwd": ffwd.init(fk),
                "gn1": gn1.init(n1k), "gn2": gn2.init(n2k)}

    def apply(self, params, g: GraphsTuple, *, training=False, rng=None):
        from ..utils.config import use_pallas
        block, ffwd, gn1, gn2 = self._parts()
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        if use_pallas():
            # The pre-block LN of ef fuses into the edge-update matmul
            # (ln_matmul, see gn_block._linear_split): LN'd ef has exactly
            # one consumer, so the [T, D] normalized array never hits HBM.
            eln = params["gn1"]["edgeln"]
            gn1_nf_gf = g.with_features(
                nf=gn1._lns()[1].apply(params["gn1"]["nodeln"], g.nf),
                gf=gn1._lns()[2].apply(params["gn1"]["graphln"], g.gf))
            branch1 = block.apply(params["block"], gn1_nf_gf,
                                  training=training, rng=rngs[0],
                                  ef_ln=eln)
        else:
            branch1 = block.apply(params["block"],
                                  gn1.apply(params["gn1"], g),
                                  training=training, rng=rngs[0])
        if self._use_fused(g, training):
            # Whole second branch + both residuals in one kernel pass per
            # feature set: y = x + branch1 + FF(LN2(x)) (branch1 enters as
            # the kernel's `extra` input).
            return self._fused_branch2(params, g, branch1,
                                       training=training)
        branch2 = ffwd.apply(params["ffwd"],
                             gn2.apply(params["gn2"], g),
                             training=training, rng=rngs[1])
        return graphnet_add(graphnet_add(g, branch1), branch2)

    # Above this feature dim the fused-FFN custom_vjp LOSES under training:
    # its flash-style backward recomputes the forward (12 vs 8 matmul-units
    # of FLOPs) while XLA's residual-saving autodiff already runs at ~peak
    # MXU on the unfused chain (measured on v5e: D=384 fwd+bwd 657us XLA vs
    # 812us fused; D=256 forward 8.42ms fused vs 9.28ms XLA at 1M edges —
    # bandwidth-bound shapes win, compute-bound shapes lose).
    _FUSED_FFN_TRAIN_MAX_DIM = 256
    # ...and below this ROW count a feature set's fused FFN also loses
    # under training (the recompute overhead is not paid back by stream
    # savings at small T; the kernel's residual fold still wins at large
    # T).  r5 model-level A/Bs at D=256: E=56k/N=57k deg-1 subgraph
    # 17.89 ms per-set-unfused vs 18.70 all-fused; deg-16 shapes win
    # fused from ef=65k rows up (11.34 vs 12.49 at E=65k; 48.3 vs 55.9 at
    # E=262k; 190.4 vs 220.6 at E=1M).  Per-SET gate so the big edge set
    # can fuse while a small node set composes.
    _FUSED_FFN_TRAIN_MIN_ROWS = 1 << 16

    def _use_fused(self, g: GraphsTuple, training: bool) -> bool:
        from ..ops.pallas.fused_ffn import supports_fused_ffn
        from ..utils.config import use_pallas
        if not use_pallas() or (training and self.dropout > 0):
            return False
        if training and self.dims[0] > self._FUSED_FFN_TRAIN_MAX_DIM:
            return False
        return (supports_fused_ffn(g.num_edge_slots, self.dims[0])
                and supports_fused_ffn(g.num_node_slots, self.dims[1]))

    def _fused_branch2(self, params, g: GraphsTuple,
                       branch1: GraphsTuple, *,
                       training: bool = False) -> GraphsTuple:
        from ..ops.pallas.fused_ffn import (ln_ffn_residual,
                                            ln_ffn_residual_reference)
        ln2, ff = params["gn2"], params["ffwd"]

        def one(x, extra, ln_key, ff_key):
            ln_p = ln2[ln_key]
            f = ff[ff_key]
            fn = ln_ffn_residual
            if training and x.shape[0] < self._FUSED_FFN_TRAIN_MIN_ROWS:
                # Same math, composed (XLA saves residuals instead of the
                # kernel recomputing them) — the measured winner for
                # small row counts under training.
                fn = ln_ffn_residual_reference
            return fn(x, ln_p["scale"], ln_p["bias"],
                      f["0"]["w"], f["0"]["b"],
                      f["1"]["w"], f["1"]["b"], extra=extra)

        return g.with_features(
            ef=one(g.ef, branch1.ef, "edgeln", "eff"),
            nf=one(g.nf, branch1.nf, "nodeln", "nff"),
            gf=one(g.gf, branch1.gf, "graphln", "gff"),
        )


@dataclasses.dataclass(frozen=True)
class GNCoreList(Module):
    """Sequential composition of cores
    (``/root/reference/src/gncorelist.jl:37-45``).

    ``remat=True`` wraps each core in ``jax.checkpoint``: activations inside
    a core are recomputed during the backward pass instead of stored, so
    training memory scales with ONE core instead of the full stack depth —
    the standard TPU trade of FLOPs for HBM (SURVEY.md).  Gradients are
    unchanged (tested).
    """

    cores: Tuple[Module, ...]
    remat: bool = False

    def __init__(self, cores: Sequence[Module], remat: bool = False):
        object.__setattr__(self, "cores", tuple(cores))
        object.__setattr__(self, "remat", remat)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.cores), 1))
        return {str(i): c.init(keys[i]) for i, c in enumerate(self.cores)}

    def apply(self, params, g: GraphsTuple, *, training=False, rng=None):
        for i, c in enumerate(self.cores):
            crng = None
            if rng is not None:
                rng, crng = jax.random.split(rng)
            if self.remat:
                def fwd(p, g, r, c=c):
                    return c.apply(p, g, training=training, rng=r)
                g = jax.checkpoint(fwd)(params[str(i)], g, crng)
            else:
                g = c.apply(params[str(i)], g, training=training, rng=crng)
        return g
