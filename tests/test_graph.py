"""Tests for batching geometry: round trips, edge ordering, views, collapse.

Mirrors the reference's testsets "batch_inverse_2D"/"batch_inverse_3D"
(``/root/reference/test/runtests.jl:328-390``), "Test edge collapsing"
(``:4-59``), and the golden broadcaster orderings (``:466-509``).
"""

import numpy as np
import pytest

import graphnets_tpu as gn

ADJ1 = np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]])
ADJ2 = np.array([[1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0], [1, 1, 0, 1]])
# Golden from /root/reference/test/runtests.jl:480-509.
ADJ_G1 = np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]])
ADJ_G2 = np.array([[0, 1, 0], [0, 0, 1], [1, 1, 0]])


def rand_feats(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def test_edge_ordering_golden():
    """Canonical edge order = column-major adjacency slots; golden src/dst
    lists derived from the explicit broadcaster matrices in
    ``/root/reference/test/runtests.jl:491-509``."""
    g = gn.batch({"graphs": [ADJ_G1, ADJ_G2], "ef": None,
                  "nf": [np.eye(3, 2, dtype=np.float32)] * 2, "gf": None})
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    # Graph 1: slots 1,2,5,7,9 (1-based col-major) -> (src,dst) 0-based.
    assert list(s[:5]) == [0, 1, 1, 0, 2]
    assert list(r[:5]) == [0, 0, 1, 2, 2]
    # Graph 2: slots 3,4,6,8 -> (2,0),(0,1),(2,1),(1,2); offset +3.
    assert list(s[5:9] - 3) == [2, 0, 2, 1]
    assert list(r[5:9] - 3) == [0, 1, 1, 2]


def test_batch_inverse_heterogeneous():
    rng = np.random.default_rng(0)
    e1, e2 = int((ADJ1 == 1).sum()), int((ADJ2 == 1).sum())
    x = {
        "graphs": [ADJ1, ADJ2],
        "ef": [rand_feats(rng, e1, 3), rand_feats(rng, e2, 3)],
        "nf": [rand_feats(rng, 3, 4), rand_feats(rng, 4, 4)],
        "gf": [rand_feats(rng, 5), rand_feats(rng, 5)],
    }
    y = gn.unbatch(gn.batch(x))
    for b in range(2):
        assert np.array_equal(y["graphs"][b], x["graphs"][b])
        assert np.array_equal(y["ef"][b], x["ef"][b])
        assert np.array_equal(y["nf"][b], x["nf"][b])
        assert np.array_equal(y["gf"][b], x["gf"][b])


def test_batch_inverse_homogeneous():
    rng = np.random.default_rng(1)
    e1 = int((ADJ1 == 1).sum())
    x = {
        "graphs": ADJ1,
        "ef": rand_feats(rng, 2, e1, 3),
        "nf": rand_feats(rng, 2, 3, 4),
        "gf": rand_feats(rng, 2, 5),
    }
    g = gn.batch(x)
    assert g.homogeneous
    y = gn.unbatch(g)
    assert np.array_equal(y["graphs"], ADJ1)
    assert np.array_equal(y["ef"], x["ef"])
    assert np.array_equal(y["nf"], x["nf"])
    assert np.array_equal(y["gf"], x["gf"])


def test_batch_with_padding_roundtrip():
    rng = np.random.default_rng(2)
    e1, e2 = int((ADJ1 == 1).sum()), int((ADJ2 == 1).sum())
    x = {
        "graphs": [ADJ1, ADJ2],
        "ef": [rand_feats(rng, e1, 3), rand_feats(rng, e2, 3)],
        "nf": [rand_feats(rng, 3, 4), rand_feats(rng, 4, 4)],
        "gf": [rand_feats(rng, 5), rand_feats(rng, 5)],
    }
    pad = gn.PadSpec(num_nodes=16, num_edges=32, num_graphs=4)
    g = gn.batch(x, pad=pad)
    assert g.num_node_slots == 16 and g.num_edge_slots == 32
    assert g.num_graph_slots == 4
    y = gn.unbatch(g)
    for b in range(2):
        assert np.array_equal(y["ef"][b], x["ef"][b])
        assert np.array_equal(y["nf"][b], x["nf"][b])
        assert np.array_equal(y["gf"][b], x["gf"][b])


def test_pad_requires_padding_graph():
    rng = np.random.default_rng(3)
    x = {"graphs": [ADJ1], "ef": None, "nf": [rand_feats(rng, 3, 4)],
         "gf": None}
    with pytest.raises(ValueError):
        gn.batch(x, pad=gn.PadSpec(num_nodes=8, num_edges=None,
                                   num_graphs=1))


def test_views():
    rng = np.random.default_rng(4)
    e1, e2 = int((ADJ1 == 1).sum()), int((ADJ2 == 1).sum())
    x = {
        "graphs": [ADJ1, ADJ2],
        "ef": [rand_feats(rng, e1, 3), rand_feats(rng, e2, 3)],
        "nf": [rand_feats(rng, 3, 4), rand_feats(rng, 4, 4)],
        "gf": [rand_feats(rng, 5), rand_feats(rng, 5)],
    }
    g = gn.batch(x)
    assert np.allclose(gn.efview(g, slice(None), 2, 1), x["ef"][1][2])
    assert np.allclose(gn.nfview(g, slice(None), 1, 0), x["nf"][0][1])
    assert np.allclose(gn.gfview(g, slice(None), 1), x["gf"][1])


def test_flat_unpadded():
    rng = np.random.default_rng(5)
    e1, e2 = int((ADJ1 == 1).sum()), int((ADJ2 == 1).sum())
    x = {
        "graphs": [ADJ1, ADJ2],
        "ef": [rand_feats(rng, e1, 3), rand_feats(rng, e2, 3)],
        "nf": [rand_feats(rng, 3, 4), rand_feats(rng, 4, 4)],
        "gf": None,
    }
    g = gn.batch(x, pad=gn.PadSpec(16, 32, 4))
    fn = np.asarray(gn.flat_unpadded_nf(g))
    fe = np.asarray(gn.flat_unpadded_ef(g))
    assert np.allclose(fn, np.concatenate(x["nf"], axis=0))
    assert np.allclose(fe, np.concatenate(x["ef"], axis=0))


def test_edge_collapse_symmetric():
    """Mirror of "Test edge collapsing"
    (``/root/reference/test/runtests.jl:4-59``): collapsed features average
    the (i,j)/(j,i) slot pair; self-loops pass through."""
    adj = np.array([[1, 1, 0], [1, 0, 1], [0, 1, 1]])  # symmetric
    rng = np.random.default_rng(6)
    e = int((adj == 1).sum())
    ef = rand_feats(rng, e, 4)
    g = gn.batch({"graphs": [adj], "ef": [ef], "nf": None, "gf": None})
    out = gn.collapse_ef(g)[0]
    # canonical edge order for adj: cols j outer: (0,0),(1,0),(0,1),(2,1),
    # (1,2),(2,2) -> indices 0..5
    # lower-tri present coords (col-major, i>=j): (0,0),(1,0),(2,1),(2,2)
    assert out.shape == (4, 4)
    assert np.allclose(out[0], ef[0])                      # self loop (0,0)
    assert np.allclose(out[1], (ef[1] + ef[2]) / 2)        # (1,0)&(0,1)
    assert np.allclose(out[2], (ef[3] + ef[4]) / 2)        # (2,1)&(1,2)
    assert np.allclose(out[3], ef[5])                      # self loop (2,2)
    flat = gn.flat_unpadded_collapsed_ef(g)
    assert flat.shape == (4, 4)


def test_edge_collapse_batch():
    adj1 = np.array([[1, 1], [1, 0]])
    adj2 = np.array([[0, 1], [1, 1]])
    rng = np.random.default_rng(7)
    ef1 = rand_feats(rng, 3, 2)
    ef2 = rand_feats(rng, 3, 2)
    g = gn.batch({"graphs": [adj1, adj2], "ef": [ef1, ef2], "nf": None,
                  "gf": None})
    outs = gn.collapse_ef(g)
    # adj1 edges (col-major): (0,0),(1,0),(0,1) ; lower-tri present: (0,0),(1,0)
    assert np.allclose(outs[0][0], ef1[0])
    assert np.allclose(outs[0][1], (ef1[1] + ef1[2]) / 2)
    # adj2 edges: (1,0),(0,1),(1,1); lower-tri present: (1,0),(1,1)
    assert np.allclose(outs[1][0], (ef2[0] + ef2[1]) / 2)
    assert np.allclose(outs[1][1], ef2[2])


def test_adjacency_reconstruction():
    g = gn.batch({"graphs": [ADJ1, ADJ2], "ef": None,
                  "nf": [np.zeros((3, 1), np.float32),
                         np.zeros((4, 1), np.float32)], "gf": None})
    mats = gn.adjacency_matrices(g)
    assert np.array_equal(mats[0], ADJ1)
    assert np.array_equal(mats[1], ADJ2)


def test_edge2node_aggregation_golden():
    """Golden from the reference's commented-out "edge2nodebroadcaster"
    testset (``/root/reference/test/runtests.jl:654-683``): the explicit
    expected broadcaster matrices define exactly which canonical-order
    edges aggregate into which node.  Here: aggregate one-hot edge ids and
    check the incidence pattern matches those matrices."""
    import jax.numpy as jnp
    from graphnets_tpu.ops import scatter

    g = gn.batch({"graphs": [ADJ_G1, ADJ_G2], "ef": None,
                  "nf": [np.eye(3, 2, dtype=np.float32)] * 2, "gf": None})
    E = g.num_edge_slots
    ef = jnp.eye(E, dtype=jnp.float32)  # edge k -> one-hot row k
    agg = np.asarray(scatter.aggregate_edges_for_nodes(
        ef, g.receivers, g.num_node_slots, g.edge_mask))
    # From expected_1 (dense slots 1,2 -> node0; 5 -> node1; 7,9 -> node2)
    # and expected_2 (slot 3 -> node0; 4,6 -> node1; 8 -> node2), mapped to
    # canonical edge indices 0..8 of the batched COO layout:
    want = np.zeros((6, E), np.float32)
    want[0, [0, 1]] = 1   # graph1 node0 <- edges (0,0),(1,0)
    want[1, 2] = 1        # graph1 node1 <- edge (1,1)
    want[2, [3, 4]] = 1   # graph1 node2 <- edges (0,2),(2,2)
    want[3, 5] = 1        # graph2 node0 <- edge (2,0)
    want[4, [6, 7]] = 1   # graph2 node1 <- edges (0,1),(2,1)
    want[5, 8] = 1        # graph2 node2 <- edge (1,2)
    np.testing.assert_array_equal(agg[:6], want)
