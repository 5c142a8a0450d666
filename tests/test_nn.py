"""Neural-module numerics: Flux-parity LayerNorm, dropout, FeedForward."""

import jax
import jax.numpy as jnp
import numpy as np

from graphnets_tpu.nn.core import (Chain, Dropout, FeedForward, LayerNorm,
                                   Linear, relu)


def test_linear():
    lin = Linear(4, 3)
    p = lin.init(jax.random.PRNGKey(0))
    assert p["w"].shape == (4, 3) and p["b"].shape == (3,)
    x = jnp.ones((2, 4))
    y = lin.apply(p, x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x @ p["w"] + p["b"]), rtol=1e-6)


def test_linear_zero_dims():
    assert Linear(0, 3).apply(Linear(0, 3).init(jax.random.PRNGKey(0)),
                              jnp.zeros((5, 0))).shape == (5, 3)
    assert Linear(3, 0).apply(Linear(3, 0).init(jax.random.PRNGKey(0)),
                              jnp.zeros((5, 3))).shape == (5, 0)


def test_layernorm_flux_parity():
    """Flux normalises by (std + eps), uncorrected std — not rsqrt(var+eps)."""
    ln = LayerNorm(8)
    p = ln.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
    y = np.asarray(ln.apply(p, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    std = np.sqrt(((x - mean) ** 2).mean(-1, keepdims=True))
    expected = (x - mean) / (std + 1e-5)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_dropout():
    d = Dropout(0.5)
    x = jnp.ones((1000, 8))
    # Eval mode / rate 0: identity.
    np.testing.assert_array_equal(np.asarray(d.apply({}, x)), np.asarray(x))
    y = np.asarray(d.apply({}, x, training=True,
                           rng=jax.random.PRNGKey(0)))
    frac_zero = (y == 0).mean()
    assert 0.4 < frac_zero < 0.6
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 2.0, rtol=1e-6)


def test_feedforward_structure():
    ff = FeedForward(8, dropout=0.0)
    p = ff.init(jax.random.PRNGKey(0))
    assert p["0"]["w"].shape == (8, 32)
    assert p["1"]["w"].shape == (32, 8)
    x = jnp.ones((4, 8))
    y = ff.apply(p, x)
    h = np.maximum(np.asarray(x @ p["0"]["w"] + p["0"]["b"]), 0)
    expected = h @ np.asarray(p["1"]["w"]) + np.asarray(p["1"]["b"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_chain_rng_split():
    c = Chain(Dropout(0.5), Dropout(0.5))
    x = jnp.ones((100, 8))
    y = c.apply(c.init(jax.random.PRNGKey(0)), x, training=True,
                rng=jax.random.PRNGKey(1))
    assert np.asarray(y).max() >= 4.0 - 1e-5  # double-scaled survivors exist
