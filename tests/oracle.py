"""Dense numpy oracle of the reference's GNBlock/GNCore semantics.

An independent reimplementation (pure numpy, dense PN^2 edge-slot space with
0/1 broadcaster aggregation, exactly the algorithm of
``/root/reference/src/gngraphbatch.jl`` + ``gnblock.jl`` + ``gncore.jl``) used
to cross-check the sparse TPU-native implementation on identical weights.
Layout here is feature-last for convenience; the aggregation path is the
dense-broadcaster one, fully independent of the package's sparse gather/
segment-sum path.

Weights are given in the package's param format (``w: [din, dout]``).
"""

from __future__ import annotations

import numpy as np


def slot(i: int, j: int, pn: int) -> int:
    """Column-major dense edge-slot id of edge (src=i, dst=j), 0-based
    (``/root/reference/src/pad.jl:30``)."""
    return j * pn + i


def edge_list(adj: np.ndarray):
    """Edges in canonical (column-major slot) order as (src, dst) pairs."""
    n = adj.shape[0]
    out = []
    for j in range(n):
        for i in range(n):
            if adj[i, j] == 1:
                out.append((i, j))
    return out


def dense_ef(adj: np.ndarray, ef: np.ndarray, pn: int) -> np.ndarray:
    """Scatter real edge features [E, DE] into the dense [PN^2, DE] slots."""
    de = ef.shape[1]
    out = np.zeros((pn * pn, de), np.float32)
    for k, (i, j) in enumerate(edge_list(adj)):
        out[slot(i, j, pn)] = ef[k]
    return out


def linear(x, p):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layernorm(x, p, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    std = np.sqrt(((x - mean) ** 2).mean(-1, keepdims=True))
    y = (x - mean) / (std + eps)
    return y * p["scale"] + p["bias"]


def feedforward(x, p):
    h = np.maximum(linear(x, p["0"]), 0.0)
    return linear(h, p["1"])  # dropout rate 0 in oracle tests


def gnblock_dense(adj_mats, efs, nfs, gfs, params):
    """Reference-semantics GNBlock forward on a heterogeneous batch.

    adj_mats: list of [n,n]; efs: list of [E_i, DE] or None; nfs: list of
    [N_i, DN] or None; gfs: [B, DG] or None.  Returns per-graph real-slot
    outputs: (efs_out list, nfs_out list, gfs_out [B, DG'] ).
    Mirrors ``/root/reference/src/gnblock.jl:63-69`` with dense broadcasters.
    """
    B = len(adj_mats)
    pn = max(a.shape[0] for a in adj_mats)
    efs_out, nfs_out, gfs_out = [], [], []
    for b in range(B):
        adj = np.zeros((pn, pn), adj_mats[b].dtype)
        n = adj_mats[b].shape[0]
        adj[:n, :n] = adj_mats[b]
        edges = edge_list(adj)

        de = efs[b].shape[1] if efs is not None else 0
        dn = nfs[b].shape[1] if nfs is not None else 0
        dg = gfs.shape[1] if gfs is not None else 0

        ef_d = (dense_ef(adj, efs[b], pn) if efs is not None
                else np.zeros((pn * pn, 0), np.float32))
        nf = np.zeros((pn, dn), np.float32)
        if nfs is not None:
            nf[:n] = nfs[b]
        gf = gfs[b] if gfs is not None else np.zeros((0,), np.float32)

        # --- edge update over ALL dense slots (padded slots included, as in
        # the reference) -----------------------------------------------------
        src_g = np.zeros((pn * pn, dn), np.float32)
        dst_g = np.zeros((pn * pn, dn), np.float32)
        g2e = np.zeros((pn * pn, dg), np.float32)
        for (i, j) in edges:
            s = slot(i, j, pn)
            src_g[s] = nf[i]
            dst_g[s] = nf[j]
            g2e[s] = gf
        edge_in = np.concatenate([ef_d, src_g, dst_g, g2e], axis=1)
        h_ef = linear(edge_in, params["edgefn"]).astype(np.float32)

        # --- node update: sum of incoming edges per dest column -------------
        de_o = h_ef.shape[1]
        agg = np.zeros((pn, de_o), np.float32)
        for (i, j) in edges:
            agg[j] += h_ef[slot(i, j, pn)]
        g2n = np.zeros((pn, dg), np.float32)
        g2n[:n] = gf
        node_in = np.concatenate([agg, nf, g2n], axis=1)
        h_nf = linear(node_in, params["nodefn"]).astype(np.float32)

        # --- graph update: sum-pool real edges / real nodes ------------------
        e_pool = sum((h_ef[slot(i, j, pn)] for (i, j) in edges),
                     np.zeros(de_o, np.float32))
        n_pool = h_nf[:n].sum(0)
        graph_in = np.concatenate([e_pool, n_pool, gf])
        h_gf = linear(graph_in[None, :], params["graphfn"])[0]

        efs_out.append(np.stack([h_ef[slot(i, j, pn)] for (i, j) in edges])
                       if edges else np.zeros((0, de_o), np.float32))
        nfs_out.append(h_nf[:n])
        gfs_out.append(h_gf)
    return efs_out, nfs_out, np.stack(gfs_out)


def gncore_dense(adj_mats, efs, nfs, gfs, params):
    """y = x + GNBlock(LN1(x)) + FF(LN2(x)) on real slots
    (``/root/reference/src/gncore.jl:56-59``)."""
    B = len(adj_mats)

    def ln_each(feats, p, key):
        return [layernorm(f, p[key]) for f in feats]

    ln1_ef = ln_each(efs, params["gn1"], "edgeln")
    ln1_nf = ln_each(nfs, params["gn1"], "nodeln")
    ln1_gf = layernorm(gfs, params["gn1"]["graphln"])
    b_ef, b_nf, b_gf = gnblock_dense(adj_mats, ln1_ef, ln1_nf, ln1_gf,
                                     params["block"])

    ln2_ef = ln_each(efs, params["gn2"], "edgeln")
    ln2_nf = ln_each(nfs, params["gn2"], "nodeln")
    ln2_gf = layernorm(gfs, params["gn2"]["graphln"])
    f_ef = [feedforward(x, params["ffwd"]["eff"]) for x in ln2_ef]
    f_nf = [feedforward(x, params["ffwd"]["nff"]) for x in ln2_nf]
    f_gf = feedforward(ln2_gf, params["ffwd"]["gff"])

    ef_out = [efs[b] + b_ef[b] + f_ef[b] for b in range(B)]
    nf_out = [nfs[b] + b_nf[b] + f_nf[b] for b in range(B)]
    gf_out = gfs + b_gf + f_gf
    return ef_out, nf_out, gf_out


def to_numpy_params(params):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), params)


def epd_dense(adj_mats, nfs, params, n_cores=2):
    """EncodeProcessDecode forward with reference dense-broadcaster
    semantics: encoder GNBlock (node-features-only input, zero-dim
    ef/gf), ``n_cores`` GNCores, decoder GNBlock
    (``/root/reference/examples/sort/sort.jl:51-81``)."""
    ef, nf, gf = gnblock_dense(adj_mats, None, nfs, None,
                               params["encoder"])
    for i in range(n_cores):
        ef, nf, gf = gncore_dense(adj_mats, ef, nf, gf,
                                  params["core"][str(i)])
    return gnblock_dense(adj_mats, ef, nf, gf, params["decoder"])
