#!/usr/bin/env python
"""The three README examples of the reference
(``/root/reference/examples/simple/simple.jl``), in graphnets_tpu form.

1. GNBlock on a batch sharing one adjacency matrix.
2. GNBlock on a heterogeneous batch (different structures).
3. Encoder -> GNCoreList -> decoder stack.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax

import graphnets_tpu as gn


def example_1():
    """Same graph structure across the batch."""
    x_de, x_dn, x_dg = 10, 5, 0
    y_de, y_dn, y_dg = 3, 4, 5
    adj = np.array([[1, 0, 1],
                    [1, 1, 0],
                    [0, 0, 1]])
    n, e, b = 3, int((adj == 1).sum()), 2
    rng = np.random.default_rng(0)
    x = gn.batch({
        "graphs": adj,
        "ef": rng.random((b, e, x_de), dtype=np.float32),
        "nf": rng.random((b, n, x_dn), dtype=np.float32),
        "gf": None,
    })
    block = gn.GNBlock((x_de, x_dn, x_dg), (y_de, y_dn, y_dg))
    y = block.apply(block.init(jax.random.PRNGKey(0)), x)
    out = gn.unbatch(y)
    assert out["ef"].shape == (b, e, y_de)
    assert out["nf"].shape == (b, n, y_dn)
    assert out["gf"].shape == (b, y_dg)
    print("example 1 ok:", out["ef"].shape, out["nf"].shape,
          out["gf"].shape)


def example_2():
    """Different graph structures in one batch + views."""
    de, dn, dg = 3, 4, 5
    adj1 = np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]])
    adj2 = np.array([[1, 0, 1, 0], [1, 1, 0, 1],
                     [0, 0, 1, 0], [1, 1, 0, 1]])
    e1, e2 = int((adj1 == 1).sum()), int((adj2 == 1).sum())
    rng = np.random.default_rng(1)
    x = gn.batch({
        "graphs": [adj1, adj2],
        "ef": [rng.random((e1, de), dtype=np.float32),
               rng.random((e2, de), dtype=np.float32)],
        "nf": [rng.random((3, dn), dtype=np.float32),
               rng.random((4, dn), dtype=np.float32)],
        "gf": [rng.random(dg).astype(np.float32),
               rng.random(dg).astype(np.float32)],
    })
    core = gn.GNCore((de, dn, dg))
    y = core.apply(core.init(jax.random.PRNGKey(0)), x)
    out = gn.unbatch(y)
    assert out["ef"][0].shape == (e1, de) and out["ef"][1].shape == (e2, de)
    # zero-copy-style views into the batched output
    second_edge_graph2 = gn.efview(y, slice(None), 1, 1)
    first_node_graph1 = gn.nfview(y, slice(None), 0, 0)
    globals_graph2 = gn.gfview(y, slice(None), 1)
    assert second_edge_graph2.shape == (de,)
    assert first_node_graph1.shape == (dn,)
    assert globals_graph2.shape == (dg,)
    print("example 2 ok")


def example_3():
    """Encoder -> 2x GNCore -> decoder."""
    x_dims, core_dims, y_dims = (0, 8, 0), (16, 16, 16), (2, 2, 0)
    adjs = [np.ones((4, 4), int), np.ones((3, 3), int)]
    rng = np.random.default_rng(2)
    x = gn.batch({
        "graphs": adjs, "ef": None,
        "nf": [rng.random((4, 8), dtype=np.float32),
               rng.random((3, 8), dtype=np.float32)],
        "gf": None,
    })
    from graphnets_tpu.models.encode_process_decode import \
        EncodeProcessDecode
    model = EncodeProcessDecode(x_dims, core_dims, y_dims, n_cores=2)
    y = model.apply(model.init(jax.random.PRNGKey(0)), x)
    out = gn.unbatch(y)
    assert out["nf"][0].shape == (4, 2) and out["ef"][1].shape == (9, 2)
    assert out["gf"] is None
    print("example 3 ok")


if __name__ == "__main__":
    example_1()
    example_2()
    example_3()
