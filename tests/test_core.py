"""GNCore / GNCoreList tests incl. oracle parity
(mirrors ``/root/reference/test/runtests.jl:685-735``)."""

import jax
import jax.numpy as jnp
import numpy as np

import graphnets_tpu as gn
from oracle import gncore_dense, to_numpy_params

ADJ1 = np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]])
ADJ2 = np.array([[1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0], [1, 1, 0, 1]])


def rand_feats(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def make_batch(rng, adjs, de, dn, dg, pad=None):
    ef = [rand_feats(rng, int((a == 1).sum()), de) for a in adjs]
    nf = [rand_feats(rng, a.shape[0], dn) for a in adjs]
    gf = np.stack([rand_feats(rng, dg) for _ in adjs])
    return gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": gf},
                    pad=pad), (ef, nf, gf)


def test_core_shapes():
    rng = np.random.default_rng(0)
    dims = (3, 4, 5)
    x, _ = make_batch(rng, [ADJ1, ADJ2], *dims)
    core = gn.GNCore(dims)
    params = core.init(jax.random.PRNGKey(0))
    y = gn.unbatch(core.apply(params, x))
    assert y["ef"][0].shape == (5, 3)
    assert y["nf"][1].shape == (4, 4)
    assert np.stack(y["gf"]).shape == (2, 5)


def test_core_oracle_parity():
    rng = np.random.default_rng(1)
    dims = (3, 4, 5)
    adjs = [ADJ1, ADJ2]
    x, (ef, nf, gf) = make_batch(rng, adjs, *dims,
                                 pad=gn.PadSpec(16, 32, 4))
    core = gn.GNCore(dims)
    params = core.init(jax.random.PRNGKey(3))
    y = gn.unbatch(core.apply(params, x))

    o_ef, o_nf, o_gf = gncore_dense(adjs, ef, nf, gf,
                                    to_numpy_params(params))
    for b in range(2):
        np.testing.assert_allclose(y["ef"][b], o_ef[b], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(y["nf"][b], o_nf[b], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.stack(y["gf"]), o_gf, rtol=1e-4, atol=1e-5)


def test_core_batch_invariance():
    rng = np.random.default_rng(2)
    dims = (3, 4, 5)
    e1 = int((ADJ1 == 1).sum())
    ef1, nf1, gf1 = (rand_feats(rng, e1, 3), rand_feats(rng, 3, 4),
                     rand_feats(rng, 5))
    e2 = int((ADJ2 == 1).sum())
    ef2, nf2, gf2 = (rand_feats(rng, e2, 3), rand_feats(rng, 4, 4),
                     rand_feats(rng, 5))
    core = gn.GNCore(dims)
    params = core.init(jax.random.PRNGKey(5))

    y_alone = gn.unbatch(core.apply(params, gn.batch(
        {"graphs": [ADJ1], "ef": [ef1], "nf": [nf1], "gf": [gf1]})))
    y_pair = gn.unbatch(core.apply(params, gn.batch(
        {"graphs": [ADJ1, ADJ2], "ef": [ef1, ef2], "nf": [nf1, nf2],
         "gf": [gf1, gf2]}, pad=gn.PadSpec(32, 64, 4))))
    np.testing.assert_allclose(y_pair["ef"][0], y_alone["ef"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_pair["nf"][0], y_alone["nf"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_pair["gf"][0], y_alone["gf"][0],
                               rtol=1e-5, atol=1e-5)


def test_corelist():
    rng = np.random.default_rng(3)
    dims = (3, 4, 5)
    x, _ = make_batch(rng, [ADJ1, ADJ2], *dims)
    cl = gn.GNCoreList([gn.GNCore(dims) for _ in range(2)])
    params = cl.init(jax.random.PRNGKey(0))
    y = cl.apply(params, x)
    # Sequential composition == applying each core in order.
    cores = cl.cores
    g = x
    for i, c in enumerate(cores):
        g = c.apply(params[str(i)], g)
    np.testing.assert_allclose(np.asarray(y.nf), np.asarray(g.nf),
                               rtol=1e-6, atol=1e-6)


def test_encoder_core_decoder_stack():
    """The sort-example composition: encoder GNBlock -> cores -> decoder
    (``/root/reference/examples/sort/sort.jl:51-81``)."""
    rng = np.random.default_rng(4)
    vocab, d = 16, 32
    adjs = [np.ones((4, 4), int), np.ones((3, 3), int)]
    nf = [rand_feats(rng, 4, vocab), rand_feats(rng, 3, vocab)]
    x = gn.batch({"graphs": adjs, "ef": None, "nf": nf, "gf": None},
                 pad=gn.PadSpec(16, 32, 4))
    enc = gn.GNBlock((0, vocab, 0), (d, d, d))
    cores = gn.GNCoreList([gn.GNCore((d, d, d)) for _ in range(2)])
    dec = gn.GNBlock((d, d, d), (2, 2, 0))
    k = jax.random.PRNGKey(0)
    ke, kc, kd = jax.random.split(k, 3)
    p = {"enc": enc.init(ke), "core": cores.init(kc), "dec": dec.init(kd)}
    y = dec.apply(p["dec"], cores.apply(p["core"],
                                        enc.apply(p["enc"], x)))
    assert y.nf.shape[-1] == 2 and y.ef.shape[-1] == 2 and y.gf is None


def test_corelist_remat_matches():
    """remat=True (jax.checkpoint per core) gives the same outputs and
    gradients as the unremated stack."""
    rng = np.random.default_rng(17)
    adjs = [np.ones((3, 3), int), np.ones((4, 4), int)]
    d = 8
    x = gn.batch({
        "graphs": adjs,
        "ef": [rng.normal(size=(9, d)).astype(np.float32),
               rng.normal(size=(16, d)).astype(np.float32)],
        "nf": [rng.normal(size=(3, d)).astype(np.float32),
               rng.normal(size=(4, d)).astype(np.float32)],
        "gf": rng.normal(size=(2, d)).astype(np.float32),
    }, pad=gn.PadSpec(8, 32, 4))
    plain = gn.GNCoreList([gn.GNCore((d, d, d)) for _ in range(3)])
    remat = gn.GNCoreList([gn.GNCore((d, d, d)) for _ in range(3)],
                          remat=True)
    params = plain.init(jax.random.PRNGKey(0))

    def loss(m, p):
        y = m.apply(p, x)
        return (jnp.sum(y.ef ** 2) + jnp.sum(y.nf ** 2)
                + jnp.sum(y.gf ** 2))

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_epd_oracle_parity_flagship_dims():
    """Full EncodeProcessDecode forward at the FLAGSHIP dims — encoder
    zero-dim inputs (0, 100, 0) -> cores (384, 384, 384) x2 -> decoder
    (2, 2, 0) with zero-dim gf output — against the independent dense
    numpy oracle in one assertion chain (round-4 ask #6: oracle parity at
    flagship scale, small batch since the oracle is O(PN^2))."""
    from oracle import epd_dense
    from graphnets_tpu.models.encode_process_decode import \
        EncodeProcessDecode
    rng = np.random.default_rng(9)
    adjs = [ADJ1, ADJ2]
    vocab = 100
    nf = [rand_feats(rng, a.shape[0], vocab) for a in adjs]
    x = gn.batch({"graphs": adjs, "ef": None, "nf": nf,
              "gf": None}, pad=gn.PadSpec(16, 32, 4))

    model = EncodeProcessDecode((0, vocab, 0), (384, 384, 384), (2, 2, 0),
                                n_cores=2)
    params = model.init(jax.random.PRNGKey(10))
    y = gn.unbatch(model.apply(params, x))

    o_ef, o_nf, o_gf = epd_dense(adjs, nf, to_numpy_params(params),
                                 n_cores=2)
    assert o_gf.shape[1] == 0 and y["gf"] is None or all(
        g is None for g in y.get("gf", [None]))
    for b in range(2):
        np.testing.assert_allclose(y["ef"][b], o_ef[b], rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(y["nf"][b], o_nf[b], rtol=2e-4,
                                   atol=2e-4)
