"""Minimal functional neural-module system (pure pytrees, init/apply).

The reference builds on Flux (``Dense``, ``Chain``, ``LayerNorm``, ``Dropout``,
``/root/reference/src/imports.jl:1-3``).  Here each module is a stateless
Python descriptor with ``init(key) -> params`` and
``apply(params, x, training=..., rng=...) -> y``; parameters are plain nested
dicts (JAX pytrees), which makes them directly shardable with
``jax.sharding.NamedSharding`` and checkpointable with Orbax.

Numerics are Flux-parity where it matters:

* ``Linear``: ``y = x @ W + b``, ``W: [din, dout]`` glorot-uniform, ``b``
  zeros (Flux ``Dense`` defaults).  The Flux weight is ``[dout, din]`` acting
  on column vectors — load transposed for parity.
* ``LayerNorm``: Flux normalises with ``(x - mean) / (std + eps)`` —
  **std + eps, not sqrt(var + eps)** — with uncorrected std and affine
  scale/bias (Flux ``LayerNorm``/``normalise`` defaults, eps = 1e-5).
* ``Dropout``: zero with prob ``p``, scale kept values by ``1/(1-p)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Any

__all__ = ["Module", "Linear", "Chain", "LayerNorm", "Dropout", "relu",
           "FeedForward"]


def relu(x: Array) -> Array:
    return jnp.maximum(x, jnp.zeros((), x.dtype))


class Module:
    """Base class: a hashable, stateless module descriptor."""

    def init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, x, *, training: bool = False,
              rng: Optional[jax.Array] = None):
        raise NotImplementedError

    def __call__(self, params: Params, x, **kw):
        return self.apply(params, x, **kw)


@dataclasses.dataclass(frozen=True)
class Linear(Module):
    """Affine layer with optional activation — Flux ``Dense`` equivalent.

    Zero-width dims are legal (the reference's GNBlock allows 0 feature dims,
    ``/root/reference/src/gnblock.jl:48-49``): ``din == 0`` yields the bias
    broadcast; ``dout == 0`` yields a ``[T, 0]`` output.
    """

    din: int
    dout: int
    activation: Optional[Callable[[Array], Array]] = None
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    def init(self, key: jax.Array) -> Params:
        w_key, _ = jax.random.split(key)
        if self.din == 0 or self.dout == 0:
            w = jnp.zeros((self.din, self.dout), self.param_dtype)
        else:
            w = jax.nn.initializers.glorot_uniform()(
                w_key, (self.din, self.dout), self.param_dtype)
        p = {"w": w}
        if self.use_bias:
            p["b"] = jnp.zeros((self.dout,), self.param_dtype)
        return p

    def apply(self, params: Params, x: Array, *, training: bool = False,
              rng=None) -> Array:
        y = x @ params["w"].astype(x.dtype)
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


@dataclasses.dataclass(frozen=True)
class LayerNorm(Module):
    """Flux-parity LayerNorm over the feature (last) axis.

    ``y = scale * (x - mean) / (std + eps) + bias`` with uncorrected std
    (Flux ``LayerNorm`` -> ``normalise``; note the reference normalises padded
    slots too — harmless here for the same reason it is there: aggregations
    mask padding).
    """

    dim: int
    eps: float = 1e-5
    affine: bool = True
    param_dtype: Any = jnp.float32

    def init(self, key: jax.Array) -> Params:
        if not self.affine:
            return {}
        return {"scale": jnp.ones((self.dim,), self.param_dtype),
                "bias": jnp.zeros((self.dim,), self.param_dtype)}

    def apply(self, params: Params, x: Array, *, training: bool = False,
              rng=None) -> Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        # sqrt has an infinite gradient at 0; padded slots are all-zero rows
        # (var == 0) and would poison parameter grads with 0 * inf = nan.
        # The where-guard keeps the forward value identical and makes the
        # var == 0 gradient 0.
        safe = jnp.where(var > 0, var, 1.0)
        std = jnp.where(var > 0, jnp.sqrt(safe), 0.0)
        y = (xf - mean) / (std + self.eps)             # Flux: std + eps
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class Dropout(Module):
    """Flux-parity inverted dropout.  ``rate == 0`` is the identity."""

    rate: float = 0.0

    def init(self, key: jax.Array) -> Params:
        return {}

    def apply(self, params: Params, x: Array, *, training: bool = False,
              rng: Optional[jax.Array] = None) -> Array:
        if not training or self.rate <= 0.0:
            return x
        assert rng is not None, "Dropout in training mode needs an rng"
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros((), x.dtype))


@dataclasses.dataclass(frozen=True)
class Chain(Module):
    """Sequential composition — Flux ``Chain`` equivalent."""

    layers: Tuple[Module, ...]

    def __init__(self, *layers: Module):
        if len(layers) == 1 and isinstance(layers[0], (tuple, list)):
            layers = tuple(layers[0])
        object.__setattr__(self, "layers", tuple(layers))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, max(len(self.layers), 1))
        return {str(i): l.init(keys[i]) for i, l in enumerate(self.layers)}

    def apply(self, params: Params, x, *, training: bool = False, rng=None):
        for i, l in enumerate(self.layers):
            lrng = None
            if rng is not None:
                rng, lrng = jax.random.split(rng)
            x = l.apply(params[str(i)], x, training=training, rng=lrng)
        return x


def FeedForward(d: int, dropout: float = 0.0) -> Chain:
    """``Dense(d -> 4d, relu) -> Dense(4d -> d) -> Dropout``
    (``/root/reference/src/gnfeedforward.jl:27-31``)."""
    return Chain(
        Linear(d, 4 * d, activation=relu),
        Linear(4 * d, d),
        Dropout(dropout),
    )
