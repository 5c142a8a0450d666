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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rows,d,dout", [(8, 128, 128), (256, 128, 256)])
def test_ln_matmul_matches_reference(interpret_mode, dtype, rows, d, dout):
    from graphnets_tpu.ops.pallas.ln_linear import (_forward,
                                                    ln_matmul_reference)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32), dtype)
    # include a constant row (var == 0) to exercise the safe-sqrt guard
    x = x.at[0].set(jnp.full((d,), 0.7, dtype))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, dout)).astype(np.float32) * 0.05,
                    dtype)
    out = _forward(x, scale, bias, w)
    ref = ln_matmul_reference(x, scale, bias, w)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_ln_matmul_gradients(interpret_mode):
    """Fused Pallas backward == autodiff of the pure composition, including
    the var == 0 (constant row) gradient branch."""
    from graphnets_tpu.ops.pallas.ln_linear import (ln_matmul,
                                                    ln_matmul_reference)
    rows, d, dout = 16, 128, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    x = x.at[3].set(jnp.zeros((d,)))  # all-zero padded row
    args = [
        x,
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d, dout)).astype(np.float32) * 0.05),
    ]

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ln_matmul(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ln_matmul_reference(*a)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_ffn_backward_kernel(interpret_mode):
    """Fused Pallas backward kernel == autodiff of the pure reference,
    including zero (padded) rows and the extra-residual input."""
    from graphnets_tpu.ops.pallas.fused_ffn import (ln_ffn_residual,
                                                    ln_ffn_residual_reference)
    d, rows = 128, 32
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    x = x.at[5].set(jnp.zeros((d,)))
    extra = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    args = [
        x,
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4 * d, d)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
        extra,
    ]

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ln_ffn_residual(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ln_ffn_residual_reference(*a)))

    idx = tuple(range(8))
    g_fused = jax.grad(loss_fused, argnums=idx)(*args)
    g_ref = jax.grad(loss_ref, argnums=idx)(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_fused_ffn_extra_forward(interpret_mode):
    from graphnets_tpu.ops.pallas.fused_ffn import (ln_ffn_residual,
                                                    ln_ffn_residual_reference)
    d, rows = 128, 16
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x, extra = mk(rows, d), mk(rows, d)
    args = (x, mk(d), mk(d), mk(d, 4 * d) * 0.05, mk(4 * d),
            mk(4 * d, d) * 0.05, mk(d))
    out = ln_ffn_residual(*args, extra=extra)
    ref = ln_ffn_residual_reference(*args, extra=extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ln_matmul_addend(interpret_mode):
    """Completed-row variant: addend folded in with one final rounding,
    gradients == autodiff of the pure composition."""
    from graphnets_tpu.ops.pallas.ln_linear import (ln_matmul,
                                                    ln_matmul_reference)
    rows, d, dout = 16, 128, 128
    rng = np.random.default_rng(4)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x, scale, bias, w = mk(rows, d), mk(d), mk(d), mk(d, dout) * 0.05
    addend = mk(rows, dout)

    out = ln_matmul(x, scale, bias, w, addend=addend)
    ref = ln_matmul_reference(x, scale, bias, w, addend=addend)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ln_matmul(*a[:4], addend=a[4])))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ln_matmul_reference(*a[:4], addend=a[4])))

    args = (x, scale, bias, w, addend)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_windowed_segment_sum_matches(interpret_mode):
    """Unsorted-within-graph ids + per-graph windows == jax.ops.segment_sum."""
    from graphnets_tpu.ops.pallas.segment_sum import windowed_segment_sum
    rng = np.random.default_rng(5)
    G, n_per_g, e_per_g, d = 6, 64, 128, 128
    N, E = G * n_per_g, G * e_per_g
    # senders: random WITHIN each graph (unsorted), graph-local
    seg = np.concatenate([
        rng.integers(b * n_per_g, (b + 1) * n_per_g, e_per_g)
        for b in range(G)]).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    node_off = jnp.asarray(np.arange(G + 1) * n_per_g, jnp.int32)
    edge_off = jnp.asarray(np.arange(G + 1) * e_per_g, jnp.int32)
    out = windowed_segment_sum(x, jnp.asarray(seg), N, node_off, edge_off)
    ref = jax.ops.segment_sum(x, jnp.asarray(seg), num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_take_rows_windows_grad(interpret_mode):
    """Windows-mode backward == argsort-mode backward == autodiff of take."""
    from graphnets_tpu.ops.scatter import take_rows_sorted_grad
    rng = np.random.default_rng(6)
    G, n_per_g, e_per_g, d = 4, 32, 64, 128
    N, E = G * n_per_g, G * e_per_g
    senders = np.concatenate([
        rng.integers(b * n_per_g, (b + 1) * n_per_g, e_per_g)
        for b in range(G)]).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    idx = jnp.asarray(senders)
    windows = (jnp.asarray(np.arange(G + 1) * n_per_g, jnp.int32),
               jnp.asarray(np.arange(G + 1) * e_per_g, jnp.int32))

    def via(windows_arg):
        def f(x_):
            return jnp.sum(take_rows_sorted_grad(x_, idx,
                                                 windows=windows_arg) * ct)
        return jax.grad(f)(x)

    g_win = via(windows)
    g_argsort = via(None)
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.take(x_, idx, axis=0) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_argsort), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_edge_update_matches(interpret_mode):
    """Fused SDDMM edge-update kernel == pure reference (bf16, hi/lo
    gather planes), forward and gradients."""
    from graphnets_tpu.ops.pallas.edge_update import (
        fused_edge_update, fused_edge_update_reference,
        supports_fused_edge_update)
    rng = np.random.default_rng(7)
    G, n_slots, e_slots, d = 4, 32, 128, 128
    N, E = G * n_slots, G * e_slots
    assert supports_fused_edge_update(E, N, G, d, d, n_slots, e_slots,
                                      jnp.bfloat16)
    senders = jnp.asarray(np.concatenate([
        rng.integers(b * n_slots, (b + 1) * n_slots, e_slots)
        for b in range(G)]).astype(np.int32))
    receivers = jnp.asarray(np.concatenate([
        np.sort(rng.integers(b * n_slots, (b + 1) * n_slots, e_slots))
        for b in range(G)]).astype(np.int32))
    mkf = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    ef = mkf(E, d).astype(jnp.bfloat16)
    ln = {"scale": mkf(d), "bias": mkf(d)}
    w0 = mkf(d, d).astype(jnp.bfloat16) * 0.05
    ts, tr, tg = mkf(N, d), mkf(N, d), mkf(G, d)
    b = mkf(d)

    for ln_p in (ln, None):
        out = fused_edge_update(ef, ln_p, w0, ts, tr, tg, b,
                                senders, receivers, n_slots, e_slots)
        ref = fused_edge_update_reference(ef, ln_p, w0, ts, tr, tg, b,
                                          senders, receivers, e_slots)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def loss_fused(ef_, w0_, ts_, tr_, tg_, b_, s_, bi_):
        return jnp.sum(jnp.sin(fused_edge_update(
            ef_, {"scale": s_, "bias": bi_}, w0_, ts_, tr_, tg_, b_,
            senders, receivers, n_slots, e_slots).astype(jnp.float32)))

    def loss_ref(ef_, w0_, ts_, tr_, tg_, b_, s_, bi_):
        return jnp.sum(jnp.sin(fused_edge_update_reference(
            ef_, {"scale": s_, "bias": bi_}, w0_, ts_, tr_, tg_, b_,
            senders, receivers, e_slots).astype(jnp.float32)))

    args = (ef, w0, ts, tr, tg, b, ln["scale"], ln["bias"])
    gf_ = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    gr_ = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, bb in zip(gf_, gr_):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(bb, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_gnblock_fused_edge_update_matches_split(interpret_mode):
    """GNBlock with slot_shape (fused SDDMM path) == GNBlock without
    (gather-after-transform path), bf16."""
    import dataclasses as dc
    from graphnets_tpu.graph import GraphsTuple
    from graphnets_tpu.models.gn_block import GNBlock
    rng = np.random.default_rng(8)
    G, n_slots, e_slots, d = 4, 32, 128, 128
    N, E = G * n_slots, G * e_slots
    senders = np.concatenate([
        rng.integers(b * n_slots, (b + 1) * n_slots, e_slots)
        for b in range(G)]).astype(np.int32)
    receivers = np.concatenate([
        np.sort(rng.integers(b * n_slots, (b + 1) * n_slots, e_slots))
        for b in range(G)]).astype(np.int32)
    g = GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.asarray(np.repeat(np.arange(G, dtype=np.int32),
                                         n_slots)),
        edge_graph=jnp.asarray(np.repeat(np.arange(G, dtype=np.int32),
                                         e_slots)),
        n_node=jnp.full((G,), n_slots, jnp.int32),
        n_edge=jnp.full((G,), e_slots, jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((G,), bool),
        ef=jnp.asarray(rng.normal(size=(E, d)).astype(np.float32),
                       jnp.bfloat16),
        nf=jnp.asarray(rng.normal(size=(N, d)).astype(np.float32),
                       jnp.bfloat16),
        gf=jnp.asarray(rng.normal(size=(G, d)).astype(np.float32),
                       jnp.bfloat16),
        slot_shape=(n_slots, e_slots),
    )
    block = GNBlock((d, d, d), (d, d, d))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        block.init(jax.random.PRNGKey(0)))
    out_fused = block.apply(params, g)
    out_split = block.apply(params, dc.replace(g, slot_shape=None))
    for a, b in ((out_fused.ef, out_split.ef), (out_fused.nf, out_split.nf),
                 (out_fused.gf, out_split.gf)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(512, 64), (1024, 32), (256, 256)])
def test_sorted_gather_matches(interpret_mode, dtype, shape):
    """Pallas sorted gather == jnp.take for ascending ids, including
    duplicate-heavy and sparse (gappy) id patterns."""
    from graphnets_tpu.ops.pallas.gather import (sorted_gather,
                                                 supports_sorted_gather)
    E, N = shape
    d = 128
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32), dtype)
    idx = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    assert supports_sorted_gather(E, N, d)
    out = sorted_gather(table, idx)
    ref = jnp.take(table, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_sorted_gather_extremes(interpret_mode):
    """One repeated id (span 1 per tile) and a strictly-increasing gappy
    id pattern (span >> TE per tile: multi-chunk dynamic loop)."""
    from graphnets_tpu.ops.pallas.gather import sorted_gather
    d = 128
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(2048, d)).astype(np.float32))
    for idx_np in (
        np.zeros(256, np.int32),                       # all one row
        np.full(256, 2047, np.int32),                  # all last row
        np.sort(rng.choice(2048, size=512, replace=False)).astype(np.int32),
    ):
        out = sorted_gather(table, jnp.asarray(idx_np))
        ref = jnp.take(table, jnp.asarray(idx_np), axis=0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sorted_gather_grad(interpret_mode):
    """d/d table of sorted_gather == autodiff of jnp.take (scatter-add of
    the cotangent by id)."""
    from graphnets_tpu.ops.pallas.gather import sorted_gather
    d, E, N = 128, 256, 64
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))

    g1 = jax.vjp(lambda t: sorted_gather(t, idx), table)[1](ct)[0]
    g2 = jax.vjp(lambda t: jnp.take(t, idx, axis=0), table)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_sorted_gather_unsupported_fallback(interpret_mode):
    from graphnets_tpu.ops.pallas.gather import (sorted_gather,
                                                 supports_sorted_gather)
    # dim not lane-aligned / E not tileable / table too small -> jnp.take
    assert not supports_sorted_gather(512, 64, 100)
    assert not supports_sorted_gather(100, 64, 128)
    assert not supports_sorted_gather(512, 7, 128)
    table = jnp.ones((7, 128))
    idx = jnp.zeros((512,), jnp.int32)
    np.testing.assert_array_equal(np.asarray(sorted_gather(table, idx)),
                                  np.ones((512, 128)))


def test_bf16_gather_partials_gating():
    """Size-gated bf16 partial gathers: forced-on rounds gathered split
    partials to bf16 (result within bf16 tolerance of the f32-partial
    path); auto keeps small gathers in f32 (bit-identical outputs)."""
    import graphnets_tpu as gn
    from graphnets_tpu.models.gn_block import GNBlock
    from graphnets_tpu.utils.config import get_config

    rng = np.random.default_rng(3)
    adjs = [(rng.random((5, 5)) < 0.5).astype(np.int64) for _ in range(3)]
    for a in adjs:
        a[0, 1] = 1                     # at least one edge per graph
    gt = gn.batch({
        "graphs": adjs,
        "ef": [rng.normal(size=(int((a == 1).sum()), 8)).astype(np.float32)
               for a in adjs],
        "nf": [rng.normal(size=(5, 8)).astype(np.float32) for _ in adjs],
        "gf": np.stack([rng.normal(size=8).astype(np.float32)
                        for _ in adjs]),
    })
    gt = gt.with_features(
        ef=gt.ef.astype(jnp.bfloat16), nf=gt.nf.astype(jnp.bfloat16),
        gf=gt.gf.astype(jnp.bfloat16))
    block = GNBlock((8, 8, 8), (8, 8, 8))
    params = block.init(jax.random.PRNGKey(0))

    cfg = get_config()
    old = cfg.bf16_gather_partials
    try:
        cfg.bf16_gather_partials = False
        y_f32 = block.apply(params, gt)
        cfg.bf16_gather_partials = None      # auto: small -> f32 partials
        y_auto = block.apply(params, gt)
        cfg.bf16_gather_partials = True
        y_bf16 = block.apply(params, gt)
    finally:
        cfg.bf16_gather_partials = old

    np.testing.assert_array_equal(np.asarray(y_auto.ef, np.float32),
                                  np.asarray(y_f32.ef, np.float32))
    np.testing.assert_allclose(np.asarray(y_bf16.ef, np.float32),
                               np.asarray(y_f32.ef, np.float32),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("adt", [jnp.float32, jnp.bfloat16])
def test_sorted_gather_add_fused(interpret_mode, adt):
    """Fused gather+addend == take + add, forward and gradients."""
    from graphnets_tpu.ops.pallas.gather import sorted_gather_add
    d, E, N = 128, 256, 64
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32),
                        jnp.bfloat16)
    idx = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    addend = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), adt)

    out = sorted_gather_add(table, idx, addend)
    ref = (jnp.take(table, idx, axis=0).astype(jnp.float32)
           + addend.astype(jnp.float32))
    assert out.dtype == jnp.promote_types(table.dtype, addend.dtype)
    tol = 4e-2 if out.dtype == jnp.bfloat16 else 1e-6
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)

    ct = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), out.dtype)
    g1 = jax.vjp(lambda t, a: sorted_gather_add(t, idx, a),
                 table, addend)[1](ct)
    g2 = jax.vjp(lambda t, a: jnp.take(t, idx, axis=0).astype(out.dtype)
                 + a.astype(out.dtype), table, addend)[1](ct)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=4e-2, atol=4e-2)


def test_gnblock_fused_gather_term_matches(interpret_mode):
    """GNBlock whose receiver term routes through the fused
    sorted_gather_add kernel (node slots 32-aligned, edge slots
    tileable) == pure path on real slots, forward and gradients."""
    import graphnets_tpu as gn
    from graphnets_tpu.ops.pallas.gather import supports_sorted_gather
    rng = np.random.default_rng(7)
    d = 128
    adjs = [np.ones((16, 16), int), np.ones((12, 12), int)]
    ef = [rng.normal(size=(256, d)).astype(np.float32),
          rng.normal(size=(144, d)).astype(np.float32)]
    nf = [rng.normal(size=(16, d)).astype(np.float32),
          rng.normal(size=(12, d)).astype(np.float32)]
    x = gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": None},
                 pad=gn.PadSpec(32, 512, 3))
    assert supports_sorted_gather(x.num_edge_slots, x.num_node_slots, d)
    block = gn.GNBlock((d, d, 0), (d, d, 0))
    params = block.init(jax.random.PRNGKey(0))

    def loss(p, pallas):
        enable_pallas(pallas, interpret=True)
        y = block.apply(p, x)
        m_e = x.edge_mask[:, None]
        m_n = x.node_mask[:, None]
        return (jnp.sum(jnp.where(m_e, y.ef.astype(jnp.float32), 0) ** 2)
                + jnp.sum(jnp.where(m_n, y.nf.astype(jnp.float32), 0) ** 2))

    l_pal, g_pal = jax.value_and_grad(loss)(params, True)
    l_pure, g_pure = jax.value_and_grad(loss)(params, False)
    np.testing.assert_allclose(float(l_pal), float(l_pure),
                               rtol=1e-5, atol=1e-5)
    flat_p = jax.tree_util.tree_leaves(g_pal)
    flat_q = jax.tree_util.tree_leaves(g_pure)
    for a, b in zip(flat_p, flat_q):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("has_ln", [True, False])
def test_fused_g1_edge_update_matches(interpret_mode, dtype, has_ln):
    """Fused single-graph edge-update kernel == the composed-op reference
    (LN(ef) @ W0 + src + tr[rl] + gb) in interpreter mode."""
    from graphnets_tpu.ops.pallas.edge_update_g1 import (
        _forward, _reference, supports_g1_edge_update)
    E, N, d = 512, 64, 128
    rng = np.random.default_rng(5)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), dtype)
    src = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), dtype)
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32), dtype)
    w0 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05,
                     dtype)
    rl = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    gb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    assert supports_g1_edge_update(E, N, d, d, 2)

    out = _forward(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    ref = _reference(ef, scale, bias, w0, src, tr, rl, gb, has_ln)
    tol = 2e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_fused_g1_edge_update_gradients(interpret_mode):
    """custom_vjp of the fused G=1 edge update == autodiff of the composed
    reference (f32)."""
    from graphnets_tpu.ops.pallas.edge_update_g1 import _op, _reference
    E, N, d = 256, 32, 128
    rng = np.random.default_rng(6)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05)
    rl = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    gb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def f_kernel(ef, scale, bias, w0, src, tr, gb):
        return jnp.sum(jnp.sin(_op(ef, scale, bias, w0, src, tr, rl, gb,
                                   True)))

    def f_ref(ef, scale, bias, w0, src, tr, gb):
        return jnp.sum(jnp.sin(_reference(ef, scale, bias, w0, src, tr, rl,
                                          gb, True)))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4, 5, 6))(
        ef, scale, bias, w0, src, tr, gb)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        ef, scale, bias, w0, src, tr, gb)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gnblock_g1_fused_path_matches_pure(interpret_mode):
    """GNBlock routed through the fused G=1 edge update == the pure
    concat-formulation block on a canonical single-graph input."""
    from graphnets_tpu.graph import GraphsTuple
    from graphnets_tpu.models.gn_block import GNBlock
    from graphnets_tpu.utils.config import enable_pallas
    E, N, d = 512, 64, 128
    rng = np.random.default_rng(7)
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    g = GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(rng.normal(size=(E, d)).astype(np.float32)),
        nf=jnp.asarray(rng.normal(size=(N, d)).astype(np.float32)),
        gf=jnp.asarray(rng.normal(size=(1, d)).astype(np.float32)))
    block = GNBlock((d, d, d), (d, d, d))
    params = block.init(jax.random.PRNGKey(8))

    out_fused = block.apply(params, g)       # pallas interpret: G=1 kernel
    enable_pallas(False)
    out_pure = block.apply(params, g)
    enable_pallas(True, interpret=True)
    for a, b in [(out_fused.ef, out_pure.ef), (out_fused.nf, out_pure.nf),
                 (out_fused.gf, out_pure.gf)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_g1_edge_update_agg_matches(interpret_mode, dtype):
    """Agg-emitting G=1 kernel: h == the plain kernel's output and agg ==
    the sorted f32 segment sum of the rounded h (same pass, RMW chunks)."""
    from graphnets_tpu.ops.pallas.edge_update_g1 import (
        _forward, _reference2, supports_g1_edge_update)
    E, N, d = 512, 64, 128
    rng = np.random.default_rng(11)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), dtype)
    src = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32), dtype)
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32), dtype)
    w0 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05,
                     dtype)
    rl = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    gb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    assert supports_g1_edge_update(E, N, d, d, 2, with_agg=True)

    h, agg = _forward(ef, scale, bias, w0, src, tr, rl, gb, True,
                      with_agg=True)
    h_ref, agg_ref = _reference2(ef, scale, bias, w0, src, tr, rl, gb,
                                 True)
    tol = 2e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=tol, atol=tol)
    # agg sums ~8 rounded-h rows in f32: tolerance scales with that sum
    np.testing.assert_allclose(np.asarray(agg), np.asarray(agg_ref),
                               rtol=5 * tol, atol=5 * tol)


def test_fused_g1_edge_update_agg_gradients(interpret_mode):
    """custom_vjp of the agg-fused op (both outputs consumed) == autodiff
    of the composed reference."""
    from graphnets_tpu.ops.pallas.edge_update_g1 import _op2, _reference2
    E, N, d = 256, 32, 128
    rng = np.random.default_rng(12)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05)
    rl = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    gb = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def f_kernel(ef, scale, bias, w0, src, tr, gb):
        h, agg = _op2(ef, scale, bias, w0, src, tr, rl, gb, True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(jnp.cos(agg * 0.1))

    def f_ref(ef, scale, bias, w0, src, tr, gb):
        h, agg = _reference2(ef, scale, bias, w0, src, tr, rl, gb, True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(jnp.cos(agg * 0.1))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4, 5, 6))(
        ef, scale, bias, w0, src, tr, gb)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        ef, scale, bias, w0, src, tr, gb)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_edge_update_agg_matches(interpret_mode):
    """G>=2 agg-emitting SDDMM kernel: h matches the reference and agg ==
    sorted segment sum of the rounded h (per-tile disjoint blocks)."""
    from graphnets_tpu.ops.pallas.edge_update import (
        fused_edge_update_agg, fused_edge_update_reference,
        supports_fused_edge_update)
    G, ns, es, d = 4, 64, 512, 128
    N, E = G * ns, G * es
    rng = np.random.default_rng(13)
    senders = np.concatenate([
        rng.integers(b * ns, b * ns + ns, size=es) for b in range(G)
    ]).astype(np.int32)
    receivers = np.concatenate([
        np.sort(rng.integers(b * ns, b * ns + ns, size=es))
        for b in range(G)
    ]).astype(np.int32)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32),
                     jnp.bfloat16)
    ts = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    tg = jnp.asarray(rng.normal(size=(G, d)).astype(np.float32))
    w0 = jnp.asarray((rng.normal(size=(d, d)) * 0.05).astype(np.float32),
                     jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    ln_p = {"scale": jnp.asarray(rng.normal(size=(d,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(d,)).astype(np.float32))}
    assert supports_fused_edge_update(E, N, G, d, d, ns, es, jnp.bfloat16,
                                      with_agg=True)
    h, agg = fused_edge_update_agg(ef, ln_p, w0, ts, tr, tg, b,
                                   jnp.asarray(senders),
                                   jnp.asarray(receivers), ns, es)
    h_ref = fused_edge_update_reference(ef, ln_p, w0, ts, tr, tg, b,
                                        jnp.asarray(senders),
                                        jnp.asarray(receivers), es)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=5e-2, atol=5e-2)
    agg_ref = np.zeros((N, d), np.float32)
    np.add.at(agg_ref, receivers, np.asarray(h, np.float32))
    np.testing.assert_allclose(np.asarray(agg), agg_ref,
                               rtol=1e-4, atol=1e-4)


def test_fused_edge_update_agg_gradients(interpret_mode):
    """custom_vjp of the G>=2 agg variant (both outputs consumed) == the
    no-agg op + explicit segment sum."""
    from graphnets_tpu.ops.pallas.edge_update import (fused_edge_update,
                                                      fused_edge_update_agg)
    G, ns, es, d = 2, 32, 256, 128
    N, E = G * ns, G * es
    rng = np.random.default_rng(14)
    senders = np.concatenate([
        rng.integers(b * ns, b * ns + ns, size=es) for b in range(G)
    ]).astype(np.int32)
    receivers = np.concatenate([
        np.sort(rng.integers(b * ns, b * ns + ns, size=es))
        for b in range(G)
    ]).astype(np.int32)
    s_j, r_j = jnp.asarray(senders), jnp.asarray(receivers)
    ef = jnp.asarray(rng.normal(size=(E, d)).astype(np.float32),
                     jnp.bfloat16)
    ts = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    tg = jnp.asarray(rng.normal(size=(G, d)).astype(np.float32))
    w0 = jnp.asarray((rng.normal(size=(d, d)) * 0.05).astype(np.float32),
                     jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def f_agg(ef, ts, tr, tg):
        h, agg = fused_edge_update_agg(ef, None, w0, ts, tr, tg, b,
                                       s_j, r_j, ns, es)
        return (jnp.sum(jnp.sin(h.astype(jnp.float32)))
                + jnp.sum(jnp.cos(agg * 0.1)))

    def f_split(ef, ts, tr, tg):
        h = fused_edge_update(ef, None, w0, ts, tr, tg, b, s_j, r_j,
                              ns, es)
        agg = jax.ops.segment_sum(h.astype(jnp.float32), r_j,
                                  num_segments=N, indices_are_sorted=True)
        return (jnp.sum(jnp.sin(h.astype(jnp.float32)))
                + jnp.sum(jnp.cos(agg * 0.1)))

    ga = jax.grad(f_agg, argnums=(0, 1, 2, 3))(ef, ts, tr, tg)
    gs = jax.grad(f_split, argnums=(0, 1, 2, 3))(ef, ts, tr, tg)
    for a, b_ in zip(ga, gs):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_zero_size_extra_keeps_primal_shape(interpret_mode):
    """ADVICE r4: a genuinely zero-size extra/addend with a non-(0,0)
    shape (e.g. (0, d)) passed straight to the custom_vjp op must get a
    cotangent in its own shape, not a hardcoded (0, 0)."""
    from graphnets_tpu.ops.pallas.fused_ffn import _op as ffn_op
    from graphnets_tpu.ops.pallas.ln_linear import _op as ln_op
    d = 128
    z = jnp.zeros((0, d), jnp.float32)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    w1 = jnp.zeros((d, 4 * d), jnp.float32)
    b1 = jnp.zeros((4 * d,), jnp.float32)
    w2 = jnp.zeros((4 * d, d), jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)

    g = jax.grad(lambda e: jnp.sum(
        ffn_op(z, scale, bias, w1, b1, w2, b2, e)))(z)
    assert g.shape == (0, d)

    w = jnp.zeros((d, d), jnp.float32)
    g2 = jax.grad(lambda a: jnp.sum(ln_op(z, scale, bias, w, a)))(z)
    assert g2.shape == (0, d)


def test_supports_g1_mixed_itemsize_accounting():
    """ADVICE r4: the VMEM gate must account src/tr partials at THEIR
    itemsize, not the edge features' — bf16 ef with f32 partials was
    under-accounted by the single-itemsize formula."""
    from graphnets_tpu.ops.pallas.edge_update_g1 import \
        supports_g1_edge_update
    E, N, D = 1 << 20, 65536, 512
    # bf16 everywhere fits the 12 MB budget; f32 partials push past it.
    assert supports_g1_edge_update(E, N, D, D, 2, part_itemsize=2)
    assert not supports_g1_edge_update(E, N, D, D, 2, part_itemsize=4)
    # default (no part_itemsize) preserves the old single-size behavior
    assert supports_g1_edge_update(E, N, D, D, 2) == \
        supports_g1_edge_update(E, N, D, D, 2, part_itemsize=2)


def test_fused_edge_update_agg_debug_unsorted_receivers(interpret_mode):
    """ADVICE r4: fused_edge_update_agg's backward requires globally
    ascending receivers (sorted_gather contract); debug mode now rejects
    unsorted receivers at the call instead of silently corrupting
    gradients."""
    from graphnets_tpu.ops.pallas.edge_update import fused_edge_update_agg
    from graphnets_tpu.utils.config import enable_debug_checks
    E, N, G, de, dout = 16, 8, 2, 128, 128
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    ef, ts, tr, tg = mk(E, de), mk(N, dout), mk(N, dout), mk(G, dout)
    b = mk(dout)
    senders = jnp.arange(E, dtype=jnp.int32) % N
    receivers_bad = jnp.asarray([3, 1] * (E // 2), jnp.int32)  # unsorted
    enable_debug_checks(True)
    try:
        with pytest.raises(ValueError, match="not ascending"):
            fused_edge_update_agg(ef, None, jnp.zeros((de, dout)), ts, tr,
                                  tg, b, senders, receivers_bad,
                                  n_slots=N // G, e_slots=E // G)
    finally:
        enable_debug_checks(False)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_random_gather_matches(interpret_mode, dtype):
    """Per-row-DMA random gather == jnp.take for arbitrary in-range ids
    (no sortedness), incl. repeated rows; gradient == take's adjoint."""
    from graphnets_tpu.ops.pallas.random_gather import (
        random_gather, supports_random_gather)
    N, D, E = 64, 128, 512
    assert supports_random_gather(E, N, D)
    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), dtype)
    idx = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)

    out = random_gather(table, idx)
    ref = jnp.take(table, idx, axis=0, mode="clip")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    g = jax.grad(lambda t: jnp.sum(jnp.sin(
        random_gather(t, idx).astype(jnp.float32))))(table)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.sin(
        jnp.take(t, idx, axis=0, mode="clip").astype(jnp.float32))))(table)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=tol, atol=tol)
