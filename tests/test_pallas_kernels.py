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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n_seg", [64, 9])
def test_sorted_segment_sum_matches(interpret_mode, dtype, n_seg):
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    E, D = 512, 128
    rng = np.random.default_rng(0)
    seg = jnp.asarray(np.sort(rng.integers(0, n_seg, E)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32), dtype)
    out = sorted_segment_sum(x, seg, n_seg)
    ref = jax.ops.segment_sum(x.astype(jnp.float32), seg,
                              num_segments=n_seg).astype(dtype)
    tol = 1e-5 if dtype == jnp.float32 else 8e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_sorted_segment_sum_grad(interpret_mode):
    from graphnets_tpu.ops.pallas.segment_sum import sorted_segment_sum
    E, N, D = 256, 32, 128
    rng = np.random.default_rng(1)
    seg = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(sorted_segment_sum(x, seg, N) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(
        jax.ops.segment_sum(x, seg, num_segments=N) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_gnblock_with_pallas_segsum_matches(interpret_mode):
    """Full GNBlock with the Pallas aggregation path == pure path."""
    import graphnets_tpu as gn
    rng = np.random.default_rng(2)
    d = 128
    adjs = [np.ones((8, 8), int), np.ones((8, 8), int)]
    ef = [rng.normal(size=(64, d)).astype(np.float32) for _ in range(2)]
    nf = [rng.normal(size=(8, d)).astype(np.float32) for _ in range(2)]
    x = gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": None},
                 pad=gn.PadSpec(24, 256, 3))
    block = gn.GNBlock((d, d, 0), (d, d, d))
    params = block.init(jax.random.PRNGKey(0))
    y_pallas = gn.unbatch(block.apply(params, x))
    enable_pallas(False)
    y_pure = gn.unbatch(block.apply(params, x))
    for b in range(2):
        np.testing.assert_allclose(y_pallas["nf"][b], y_pure["nf"][b],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(y_pallas["ef"][b], y_pure["ef"][b],
                                   rtol=1e-4, atol=1e-4)


def test_take_rows_sorted_grad_matches(interpret_mode):
    """take_rows_sorted_grad == jnp.take in the forward and its VJP,
    with the backward reduction running through the Pallas kernel
    (interpreter mode)."""
    import jax.numpy as jnp
    from graphnets_tpu.ops.scatter import take_rows_sorted_grad

    rng = np.random.default_rng(5)
    N, E, D = 128, 256, 128          # kernel-supported shapes
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))

    y, vjp = jax.vjp(lambda x: take_rows_sorted_grad(x, idx), x)
    y_ref, vjp_ref = jax.vjp(
        lambda x: jnp.take(x, idx, axis=0, mode="clip"), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                               np.asarray(vjp_ref(ct)[0]),
                               rtol=1e-6, atol=1e-6)
