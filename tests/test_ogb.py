"""OGB on-disk loader: round-trip through the standard raw CSV layout and
end-to-end consumption by the neighbor-sampling path (BASELINE configs 4-5;
no network egress, so a synthetic fixture is written in the official layout
and loaded back)."""

import numpy as np

from graphnets_tpu.data.large_graph import NeighborSampler
from graphnets_tpu.data.ogb import (load_ogb_node_dataset,
                                    save_ogb_node_dataset)


def make_fixture(tmp_path, n=60, e=300, d=8, n_classes=3, seed=0,
                 compress=True):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    feat = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, n_classes, n)
    ids = rng.permutation(n)
    splits = {"train": ids[: n // 2], "valid": ids[n // 2: 3 * n // 4],
              "test": ids[3 * n // 4:]}
    save_ogb_node_dataset(str(tmp_path), "ogbn-tiny", senders, receivers,
                          feat, labels, splits, compress=compress)
    return senders, receivers, feat, labels, splits


def test_roundtrip_directed(tmp_path):
    senders, receivers, feat, labels, splits = make_fixture(tmp_path)
    ds = load_ogb_node_dataset(str(tmp_path), "ogbn-tiny",
                               make_undirected=False)
    assert ds.num_nodes == feat.shape[0]
    assert ds.num_edges == len(senders)
    assert ds.num_classes == labels.max() + 1
    np.testing.assert_allclose(ds.graph.node_feat, feat, rtol=1e-6)
    np.testing.assert_array_equal(ds.graph.labels, labels)
    for part, ids in splits.items():
        np.testing.assert_array_equal(np.sort(ds.splits[part]), np.sort(ids))
    # CSC semantics: reconstruct the edge multiset from indptr/src
    recon = []
    for v in range(ds.num_nodes):
        for s in ds.graph.src[ds.graph.indptr[v]: ds.graph.indptr[v + 1]]:
            recon.append((s, v))
    orig = sorted(zip(senders.tolist(), receivers.tolist()))
    assert sorted(recon) == orig


def test_roundtrip_undirected_and_uncompressed(tmp_path):
    senders, receivers, *_ = make_fixture(tmp_path, compress=False)
    ds = load_ogb_node_dataset(str(tmp_path), "ogbn-tiny",
                               make_undirected=True)
    # make_undirected coalesces like OGB's to_undirected: reverse edges
    # added, then duplicate (src, dst) pairs removed — so reciprocal raw
    # pairs and repeated rows don't inflate multiplicity.
    both = np.stack([np.concatenate([senders, receivers]),
                     np.concatenate([receivers, senders])], axis=1)
    assert ds.num_edges == len(np.unique(both, axis=0))
    # every edge has its reverse present
    pairs = set()
    for v in range(ds.num_nodes):
        for s in ds.graph.src[ds.graph.indptr[v]: ds.graph.indptr[v + 1]]:
            pairs.add((int(s), v))
    assert all((d, s) in pairs for (s, d) in pairs)


def test_missing_dataset_error(tmp_path):
    try:
        load_ogb_node_dataset(str(tmp_path), "ogbn-absent")
    except FileNotFoundError as exc:
        assert "ogbn-absent" in str(exc)
    else:
        raise AssertionError("expected FileNotFoundError")


def test_feeds_neighbor_sampler(tmp_path):
    make_fixture(tmp_path, n=80, e=500)
    ds = load_ogb_node_dataset(str(tmp_path), "ogbn-tiny")
    sampler = NeighborSampler(ds.graph, fanouts=(4, 4), batch_size=16,
                              seed=1)
    b = sampler.sample(ds.splits["train"][:16])
    assert b.graph.nf.shape[0] == sampler.max_nodes
    assert int(b.label_mask.sum()) == 16
