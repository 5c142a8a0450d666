"""Uniform slot layout (``PadSpec.uniform``) — construction invariants,
exact-vs-uniform parity, and fused-SDDMM reachability from ``batch()``.

The uniform layout interleaves padding per graph slot (graph ``b`` owns
node slots ``[b*ns, (b+1)*ns)`` / edge slots ``[b*es, (b+1)*es)``), sets
``GraphsTuple.slot_shape``, and is the ``batch()``-reachable route to the
fused SDDMM edge-update kernel (``ops.pallas.edge_update``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import graphnets_tpu as gn
from graphnets_tpu.utils.config import enable_pallas, get_config
from graphnets_tpu.utils.debug import validate_graph


@pytest.fixture
def hetero_data():
    rng = np.random.default_rng(0)
    sizes = (2, 3, 4)
    adjs = [np.ones((n, n), int) for n in sizes]
    return {
        "graphs": adjs,
        "ef": [rng.normal(size=(n * n, 3)).astype(np.float32)
               for n in sizes],
        "nf": [rng.normal(size=(n, 5)).astype(np.float32) for n in sizes],
        "gf": rng.normal(size=(len(sizes), 2)).astype(np.float32),
    }


def test_uniform_roundtrip_and_views(hetero_data):
    g = gn.batch(hetero_data, pad=gn.PadSpec.uniform(5, 16, num_graphs=4))
    assert g.slot_shape == (8, 128)  # rounded to hw multiples
    assert g.pad_aliases_real
    assert g.num_graph_slots == 4
    validate_graph(g)

    out = gn.unbatch(g)
    for i in range(3):
        assert np.allclose(out["nf"][i], hetero_data["nf"][i])
        assert np.allclose(out["ef"][i], hetero_data["ef"][i])
        assert np.array_equal(out["graphs"][i], hetero_data["graphs"][i])
    assert np.allclose(out["gf"], hetero_data["gf"])

    # views address real (graph-local, canonical-order) slots
    assert np.isclose(gn.efview(g, 1, 2, 1), hetero_data["ef"][1][2, 1])
    assert np.isclose(gn.nfview(g, 0, 1, 2), hetero_data["nf"][2][1, 0])
    # flat accessors select real rows across interleaved padding
    assert np.allclose(np.asarray(gn.flatunpaddednf(g)),
                       np.concatenate(hetero_data["nf"]))
    assert np.allclose(np.asarray(gn.flatunpaddedef(g)),
                       np.concatenate(hetero_data["ef"]))


def test_uniform_layout_invariants(hetero_data):
    g = gn.batch(hetero_data, pad=gn.PadSpec.uniform(5, 16))
    ns, es = g.slot_shape
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask)
    nm = np.asarray(g.node_mask)
    # receivers globally ascending (sorted-segment-sum precondition)
    assert (np.diff(r) >= 0).all()
    # padded edges target their own slot's LAST node slot, a padding node
    for b in range(g.num_graph_slots):
        pe = ~em[b * es:(b + 1) * es]
        if pe.any():
            tgt_s = s[b * es:(b + 1) * es][pe]
            tgt_r = r[b * es:(b + 1) * es][pe]
            assert (tgt_s == (b + 1) * ns - 1).all()
            assert (tgt_r == (b + 1) * ns - 1).all()
            assert not nm[(b + 1) * ns - 1]
    # real edges reference real nodes
    assert nm[s[em]].all() and nm[r[em]].all()


def test_uniform_constraint_violation_raises():
    # n == n_slots with padded edges -> no padding node to target
    adj = np.ones((8, 8), int)  # 8 nodes == n_slots, 64 edges < e_slots
    rng = np.random.default_rng(0)
    data = {"graphs": [adj, adj],
            "ef": None,
            "nf": [rng.normal(size=(8, 4)).astype(np.float32)] * 2,
            "gf": None}
    with pytest.raises(ValueError, match="padding node"):
        gn.batch(data, pad=gn.PadSpec(num_nodes=8, num_edges=128,
                                      per_slot=True))


def test_uniform_exceeds_capacity_raises(hetero_data):
    with pytest.raises(ValueError, match="exceeds"):
        gn.batch(hetero_data, pad=gn.PadSpec(num_nodes=3, num_edges=8,
                                             per_slot=True))


def test_gnblock_parity_exact_vs_uniform(hetero_data):
    """Real-slot outputs and parameter grads must not depend on layout."""
    gu = gn.batch(hetero_data, pad=gn.PadSpec.uniform(5, 16))
    ge = gn.batch(hetero_data)
    block = gn.GNBlock((3, 5, 2), (7, 6, 4))
    p = block.init(jax.random.PRNGKey(0))

    ou, oe = block.apply(p, gu), block.apply(p, ge)
    uu, ue = gn.unbatch(ou), gn.unbatch(oe)
    for i in range(3):
        np.testing.assert_allclose(uu["nf"][i], ue["nf"][i], atol=1e-5)
        np.testing.assert_allclose(uu["ef"][i], ue["ef"][i], atol=1e-5)
    np.testing.assert_allclose(uu["gf"], ue["gf"], atol=1e-5)

    def loss(p, g):
        o = block.apply(p, g)
        return (jnp.sum((o.ef * g.edge_mask[:, None]) ** 2)
                + jnp.sum((o.nf * g.node_mask[:, None]) ** 2)
                + jnp.sum((o.gf * g.graph_mask[:, None]) ** 2))

    g1 = jax.jit(jax.grad(loss))(p, gu)
    g2 = jax.jit(jax.grad(loss))(p, ge)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_device_batch_uniform_matches_standard():
    """Same key -> identical real content in both layouts (the uniform
    generator must not change the task distribution)."""
    from graphnets_tpu.data.sort_task import (SortTaskConfig, device_batch,
                                              sort_pad_spec)
    cfg = SortTaskConfig()
    key = jax.random.PRNGKey(7)
    xs, ys = device_batch(key, cfg, sort_pad_spec(cfg))
    xu, yu = device_batch(key, cfg, sort_pad_spec(cfg, uniform=True))
    assert xu.slot_shape == (16, 128) and xu.pad_aliases_real
    validate_graph(xu)
    validate_graph(yu)

    def reals(g, feat, mask):
        return np.asarray(getattr(g, feat))[np.asarray(mask)]

    np.testing.assert_array_equal(reals(xs, "nf", xs.node_mask),
                                  reals(xu, "nf", xu.node_mask))
    np.testing.assert_array_equal(reals(ys, "nf", ys.node_mask),
                                  reals(yu, "nf", yu.node_mask))
    np.testing.assert_array_equal(reals(ys, "ef", ys.edge_mask),
                                  reals(yu, "ef", yu.edge_mask))


def test_fused_edge_update_reachable_from_batch():
    """A bf16 uniform batch() batch hits the fused SDDMM kernel (interpret
    mode on CPU) and matches the pure path on real slots, fwd and bwd."""
    from graphnets_tpu.ops.pallas.edge_update import \
        supports_fused_edge_update
    rng = np.random.default_rng(1)
    sizes = [7, 5, 7, 6]  # n < n_slots so padded edges have a pad node
    D = 128
    data = {
        "graphs": [np.ones((n, n), int) for n in sizes],
        "ef": [rng.normal(size=(n * n, D)).astype(np.float32)
               for n in sizes],
        "nf": [rng.normal(size=(n, D)).astype(np.float32) for n in sizes],
        "gf": rng.normal(size=(4, D)).astype(np.float32),
    }
    g = gn.batch(data, pad=gn.PadSpec.uniform(8, 128))
    gb = g.with_features(ef=g.ef.astype(jnp.bfloat16),
                         nf=g.nf.astype(jnp.bfloat16),
                         gf=g.gf.astype(jnp.bfloat16))
    assert supports_fused_edge_update(
        gb.num_edge_slots, gb.num_node_slots, gb.num_graph_slots, D, D,
        *gb.slot_shape, gb.ef.dtype)

    block = gn.GNBlock((D, D, D), (D, D, D))
    p = block.init(jax.random.PRNGKey(0))
    y_ef = jnp.asarray(
        np.eye(D, dtype=np.float32)[rng.integers(0, D, gb.num_edge_slots)])
    y_nf = jnp.asarray(
        np.eye(D, dtype=np.float32)[rng.integers(0, D, gb.num_node_slots)])

    from graphnets_tpu.training.losses import masked_logit_crossentropy

    def loss(p):
        o = block.apply(p, gb)
        return (masked_logit_crossentropy(o.ef, y_ef, gb.edge_mask)
                + masked_logit_crossentropy(o.nf, y_nf, gb.node_mask))

    old = (get_config().use_pallas, get_config().pallas_interpret)
    try:
        enable_pallas(False)
        o_pure = block.apply(p, gb)
        l_pure, g_pure = jax.value_and_grad(loss)(p)
        enable_pallas(True, interpret=True)
        o_fused = block.apply(p, gb)
        l_fused, g_fused = jax.value_and_grad(loss)(p)
    finally:
        enable_pallas(old[0], interpret=old[1])

    em = np.asarray(gb.edge_mask)
    a = np.asarray(o_fused.ef, np.float32)[em]
    b = np.asarray(o_pure.ef, np.float32)[em]
    scale = np.abs(b).max()
    assert np.abs(a - b).max() <= 2e-2 * scale

    assert np.isclose(float(l_fused), float(l_pure), rtol=2e-2)
    for ka, kb in zip(jax.tree_util.tree_leaves(g_fused),
                      jax.tree_util.tree_leaves(g_pure)):
        ka = np.asarray(ka, np.float64)
        kb = np.asarray(kb, np.float64)
        sc = max(np.abs(kb).max(), 1e-6)
        assert np.abs(ka - kb).max() / sc <= 2e-2


def test_collapse_parity_exact_vs_uniform(hetero_data):
    gu = gn.batch(hetero_data, pad=gn.PadSpec.uniform(5, 16))
    ge = gn.batch(hetero_data)
    np.testing.assert_allclose(gn.flatunpaddedcollapsedef(gu),
                               gn.flatunpaddedcollapsedef(ge))
    np.testing.assert_allclose(gn.collapse_ef_padded(gu),
                               gn.collapse_ef_padded(ge))


def test_reference_spelled_aliases():
    assert gn.GNGraphBatch is gn.GraphsTuple
    assert gn.unpaddedcollapsedef is gn.unpadded_collapsed_ef
    assert gn.flatunpaddedcollapsedef is gn.flat_unpadded_collapsed_ef
