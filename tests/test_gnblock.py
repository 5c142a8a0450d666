"""GNBlock tests: shapes, zero-dim handling, batch invariance, and parity
against the dense-broadcaster numpy oracle.

Mirrors "GNBlock batch invariance" (``/root/reference/test/runtests.jl:62-116``),
"no graph features output" (``:118-164``), "GNBlock" (``:627-652``).
"""

import jax
import numpy as np
import pytest

import graphnets_tpu as gn
from oracle import gnblock_dense, to_numpy_params

ADJ1 = np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]])
ADJ2 = np.array([[1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0], [1, 1, 0, 1]])


def rand_feats(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def make_batch(rng, adjs, de, dn, dg, pad=None):
    ef = ([rand_feats(rng, int((a == 1).sum()), de) for a in adjs]
          if de else None)
    nf = [rand_feats(rng, a.shape[0], dn) for a in adjs] if dn else None
    gf = np.stack([rand_feats(rng, dg) for _ in adjs]) if dg else None
    return gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": gf}, pad=pad), \
        (ef, nf, gf)


def test_readme_example1_shapes():
    """README Example 1: (10,5,0) => (3,4,5), batch 2, shared adjacency."""
    rng = np.random.default_rng(0)
    E = int((ADJ1 == 1).sum())
    x = gn.batch({
        "graphs": ADJ1,
        "ef": rand_feats(rng, 2, E, 10),
        "nf": rand_feats(rng, 2, 3, 5),
        "gf": None,
    })
    block = gn.GNBlock((10, 5, 0), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(0))
    y = block.apply(params, x)
    out = gn.unbatch(y)
    assert out["ef"].shape == (2, E, 3)
    assert out["nf"].shape == (2, 3, 4)
    assert out["gf"].shape == (2, 5)


def test_zero_dim_output_is_none():
    """Y_DG = 0 -> gf is None (``/root/reference/test/runtests.jl:118-164``)."""
    rng = np.random.default_rng(1)
    x, _ = make_batch(rng, [ADJ1, ADJ2], 10, 5, 0)
    block = gn.GNBlock((10, 5, 0), (3, 4, 0))
    params = block.init(jax.random.PRNGKey(0))
    y = block.apply(params, x)
    assert y.gf is None
    assert y.ef is not None and y.nf is not None


def test_zero_dim_input_ef():
    """X_DE = 0 (no input edge features) works — sort-example config."""
    rng = np.random.default_rng(2)
    x, _ = make_batch(rng, [ADJ1, ADJ2], 0, 5, 0)
    assert x.ef is None
    block = gn.GNBlock((0, 5, 0), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(0))
    y = block.apply(params, x)
    assert y.ef.shape[-1] == 3 and y.nf.shape[-1] == 4
    assert y.gf.shape[-1] == 5


def test_batch_invariance():
    """Graph A alone vs A batched with larger B: identical outputs
    (``/root/reference/test/runtests.jl:62-116``) — padding must not leak."""
    rng = np.random.default_rng(3)
    e1 = int((ADJ1 == 1).sum())
    ef1, nf1 = rand_feats(rng, e1, 6), rand_feats(rng, 3, 5)
    gf1 = rand_feats(rng, 2)
    e2 = int((ADJ2 == 1).sum())
    ef2, nf2 = rand_feats(rng, e2, 6), rand_feats(rng, 4, 5)
    gf2 = rand_feats(rng, 2)

    block = gn.GNBlock((6, 5, 2), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(7))

    x_alone = gn.batch({"graphs": [ADJ1], "ef": [ef1], "nf": [nf1],
                        "gf": [gf1]})
    x_pair = gn.batch({"graphs": [ADJ1, ADJ2], "ef": [ef1, ef2],
                       "nf": [nf1, nf2], "gf": [gf1, gf2]})
    # Also with bucket padding.
    x_padded = gn.batch({"graphs": [ADJ1, ADJ2], "ef": [ef1, ef2],
                         "nf": [nf1, nf2], "gf": [gf1, gf2]},
                        pad=gn.PadSpec(32, 64, 4))

    y_alone = gn.unbatch(block.apply(params, x_alone))
    y_pair = gn.unbatch(block.apply(params, x_pair))
    y_padded = gn.unbatch(block.apply(params, x_padded))

    for y in (y_pair, y_padded):
        np.testing.assert_allclose(y["ef"][0], y_alone["ef"][0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(y["nf"][0], y_alone["nf"][0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(y["gf"][0], y_alone["gf"][0],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_pair["ef"][1], y_padded["ef"][1],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("de,dn,dg", [
    (10, 5, 7), (10, 5, 0), (0, 5, 7), (0, 5, 0), (10, 0, 7), (10, 0, 0),
])
def test_oracle_parity(de, dn, dg):
    """Sparse path == dense-broadcaster oracle on real slots, for every
    present/absent feature combination the reference supports
    (``/root/reference/src/edgefninput.jl`` dispatch table)."""
    rng = np.random.default_rng(de * 100 + dn * 10 + dg)
    adjs = [ADJ1, ADJ2]
    x, (ef, nf, gf) = make_batch(rng, adjs, de, dn, dg,
                                 pad=gn.PadSpec(16, 32, 4))
    block = gn.GNBlock((de, dn, dg), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(11))
    y = gn.unbatch(block.apply(params, x))

    o_ef, o_nf, o_gf = gnblock_dense(adjs, ef, nf, gf,
                                     to_numpy_params(params))
    for b in range(2):
        np.testing.assert_allclose(y["ef"][b], o_ef[b], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(y["nf"][b], o_nf[b], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.stack(y["gf"]), o_gf, rtol=1e-5, atol=1e-5)


def test_jit_compatibility():
    rng = np.random.default_rng(9)
    x, _ = make_batch(rng, [ADJ1, ADJ2], 6, 5, 2, pad=gn.PadSpec(16, 32, 4))
    block = gn.GNBlock((6, 5, 2), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(0))
    jitted = jax.jit(block.apply)
    y1 = jitted(params, x)
    y2 = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1.nf), np.asarray(y2.nf),
                               rtol=1e-5, atol=1e-6)

    # Same pad spec, different structure -> no recompile needed (same shapes).
    rng2 = np.random.default_rng(10)
    x2, _ = make_batch(rng2, [ADJ2, ADJ2], 6, 5, 2,
                       pad=gn.PadSpec(16, 32, 4))
    jitted(params, x2)


def test_gradients_flow():
    rng = np.random.default_rng(12)
    x, _ = make_batch(rng, [ADJ1, ADJ2], 6, 5, 2, pad=gn.PadSpec(16, 32, 4))
    block = gn.GNBlock((6, 5, 2), (3, 4, 5))
    params = block.init(jax.random.PRNGKey(0))

    def loss(p):
        y = block.apply(p, x)
        return (jax.numpy.sum(y.ef ** 2) + jax.numpy.sum(y.nf ** 2)
                + jax.numpy.sum(y.gf ** 2))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


@pytest.mark.parametrize("de,dn,dg,out", [
    (10, 5, 7, (3, 4, 5)), (0, 5, 0, (3, 4, 5)), (10, 0, 0, (0, 4, 0)),
])
def test_split_linear_matches_concat(de, dn, dg, out):
    """The gather-after-transform fast path computes the same values and
    gradients as the concat formulation (it is the same per-row dots)."""
    from graphnets_tpu.utils.config import get_config
    rng = np.random.default_rng(3)
    x, _ = make_batch(rng, [ADJ1, ADJ2], de, dn, dg,
                      pad=gn.PadSpec(16, 32, 4))
    block = gn.GNBlock((de, dn, dg), out)
    params = block.init(jax.random.PRNGKey(5))

    def loss(p, x):
        y = block.apply(p, x)
        return sum(jax.numpy.sum(f ** 2)
                   for f in (y.ef, y.nf, y.gf) if f is not None)

    cfg = get_config()
    old = cfg.split_linear
    try:
        cfg.split_linear = True
        y_split = block.apply(params, x)
        g_split = jax.grad(loss)(params, x)
        cfg.split_linear = False
        y_cat = block.apply(params, x)
        g_cat = jax.grad(loss)(params, x)
    finally:
        cfg.split_linear = old

    for a, b in ((y_split.ef, y_cat.ef), (y_split.nf, y_cat.nf),
                 (y_split.gf, y_cat.gf)):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_split),
                    jax.tree_util.tree_leaves(g_cat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
