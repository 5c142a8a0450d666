"""Pallas kernel math vs the pure-JAX oracle (interpreter mode on CPU; the
compiled path is exercised on real TPU by bench.py and examples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphnets_tpu.ops.pallas.fused_ffn import (_fused_forward,
                                                ln_ffn_residual_reference,
                                                supports_fused_ffn)
from graphnets_tpu.utils.config import enable_pallas, get_config


@pytest.fixture
def interpret_mode():
    old = (get_config().use_pallas, get_config().pallas_interpret)
    enable_pallas(True, interpret=True)
    yield
    enable_pallas(old[0], interpret=old[1])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rows", [8, 256])
def test_fused_ffn_matches_reference(interpret_mode, dtype, rows):
    d = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32), dtype)
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.05,
                     dtype)
    b1 = jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32), dtype)
    w2 = jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32) * 0.05,
                     dtype)
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32), dtype)

    out = _fused_forward(x, scale, bias, w1, b1, w2, b2)
    ref = ln_ffn_residual_reference(x, scale, bias, w1, b1, w2, b2)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_fused_ffn_zero_rows_unsupported():
    assert not supports_fused_ffn(0, 128)
    assert not supports_fused_ffn(100, 100)
    assert supports_fused_ffn(256, 384)


def test_fused_ffn_gradients(interpret_mode):
    """custom_vjp backward (recompute via pure reference) == autodiff of the
    reference."""
    from graphnets_tpu.ops.pallas.fused_ffn import ln_ffn_residual
    d, rows = 128, 16
    rng = np.random.default_rng(1)
    args = [
        jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
    ]
    g_fused = jax.grad(lambda *a: jnp.sum(ln_ffn_residual(*a) ** 2))(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(ln_ffn_residual_reference(*a) ** 2))(*args)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_gncore_fused_matches_pure(interpret_mode):
    """GNCore with the fused branch == pure path on real slots."""
    import graphnets_tpu as gn
    rng = np.random.default_rng(2)
    d = 128
    adjs = [np.ones((4, 4), int), np.ones((3, 3), int)]
    ef = [rng.normal(size=(16, d)).astype(np.float32),
          rng.normal(size=(9, d)).astype(np.float32)]
    nf = [rng.normal(size=(4, d)).astype(np.float32),
          rng.normal(size=(3, d)).astype(np.float32)]
    gf = rng.normal(size=(2, d)).astype(np.float32)
    x = gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": gf},
                 pad=gn.PadSpec(8, 32, 3))
    core = gn.GNCore((d, d, d))
    params = core.init(jax.random.PRNGKey(0))

    y_fused = gn.unbatch(core.apply(params, x))
    enable_pallas(False)
    y_pure = gn.unbatch(core.apply(params, x))
    for b in range(2):
        np.testing.assert_allclose(y_fused["ef"][b], y_pure["ef"][b],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(y_fused["nf"][b], y_pure["nf"][b],
                                   rtol=1e-4, atol=1e-5)
