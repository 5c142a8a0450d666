#!/usr/bin/env python
"""Activation-parity harness against the Julia reference (SURVEY.md §7 P2).

No Julia runtime exists in this image, so bit-level parity is established
in two layers:

1. In-repo: the dense numpy oracle (`tests/oracle.py`) independently
   reimplements the reference's broadcaster semantics and every GNBlock /
   GNCore test asserts allclose against it.
2. Cross-repo: this script emits a self-contained ``parity_case.npz`` (graph
   structure, inputs, weights in Flux layout, and our activations) that a
   GraphNets.jl session can load to verify, and can conversely check a dump
   produced by the Julia side.

NPZ schema (feature-last on our side; Flux is channel-first — the Julia
loader transposes):

  adj_<b>            int    [n, n]        adjacency of graph b
  ef_in_<b>/nf_in_<b> f32   [E_b, DE]/[N_b, DN]
  gf_in              f32    [B, DG]
  W_edge, b_edge     f32    Flux layout: W [out, in] (we store transposed)
  W_node, b_node, W_graph, b_graph
  ef_out_<b>, nf_out_<b>, gf_out — activations after one GNBlock

Usage:
  python tools/parity_harness.py emit  --out parity_case.npz
  python tools/parity_harness.py check --case parity_case.npz
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

import graphnets_tpu as gn

DIMS_IN = (10, 5, 7)
DIMS_OUT = (3, 4, 5)
ADJS = [
    np.array([[1, 0, 1], [1, 1, 0], [0, 0, 1]]),
    np.array([[1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0], [1, 1, 0, 1]]),
]


def build_case(seed: int = 0):
    rng = np.random.default_rng(seed)
    de, dn, dg = DIMS_IN
    ef = [rng.normal(size=(int((a == 1).sum()), de)).astype(np.float32)
          for a in ADJS]
    nf = [rng.normal(size=(a.shape[0], dn)).astype(np.float32)
          for a in ADJS]
    gf = rng.normal(size=(len(ADJS), dg)).astype(np.float32)
    block = gn.GNBlock(DIMS_IN, DIMS_OUT)
    params = block.init(jax.random.PRNGKey(seed))
    return block, params, ef, nf, gf


def emit(path: str, seed: int = 0):
    block, params, ef, nf, gf = build_case(seed)
    x = gn.batch({"graphs": ADJS, "ef": ef, "nf": nf, "gf": gf})
    y = gn.unbatch(block.apply(params, x))

    out = {"gf_in": gf, "gf_out": np.stack(y["gf"])}
    for b, a in enumerate(ADJS):
        out[f"adj_{b}"] = a
        out[f"ef_in_{b}"] = ef[b]
        out[f"nf_in_{b}"] = nf[b]
        out[f"ef_out_{b}"] = np.asarray(y["ef"][b])
        out[f"nf_out_{b}"] = np.asarray(y["nf"][b])
    p = jax.device_get(params)
    # Flux stores Dense weights as [out, in] acting on column vectors.
    for ours, flux in (("edgefn", "edge"), ("nodefn", "node"),
                       ("graphfn", "graph")):
        out[f"W_{flux}"] = np.asarray(p[ours]["w"]).T
        out[f"b_{flux}"] = np.asarray(p[ours]["b"])
    np.savez(path, **out)
    print(f"wrote {path}: one GNBlock {DIMS_IN} => {DIMS_OUT}, "
          f"{len(ADJS)} graphs, edge order = column-major adjacency")


def check(path: str, rtol: float = 1e-5, atol: float = 1e-5):
    """Verify a dump (ours or Julia-produced) against this implementation."""
    d = np.load(path)
    adjs, ef, nf = [], [], []
    b = 0
    while f"adj_{b}" in d:
        adjs.append(d[f"adj_{b}"])
        ef.append(d[f"ef_in_{b}"])
        nf.append(d[f"nf_in_{b}"])
        b += 1
    gf = d["gf_in"]
    de, dn, dg = ef[0].shape[1], nf[0].shape[1], gf.shape[1]
    de_o = d["W_edge"].shape[0]
    dn_o = d["W_node"].shape[0]
    dg_o = d["W_graph"].shape[0]

    block = gn.GNBlock((de, dn, dg), (de_o, dn_o, dg_o))
    params = {
        key: {"w": d[f"W_{flux}"].T.copy(), "b": d[f"b_{flux}"].copy()}
        for key, flux in (("edgefn", "edge"), ("nodefn", "node"),
                          ("graphfn", "graph"))
    }
    x = gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": gf})
    y = gn.unbatch(block.apply(params, x))
    for i in range(b):
        np.testing.assert_allclose(np.asarray(y["ef"][i]), d[f"ef_out_{i}"],
                                   rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(y["nf"][i]), d[f"nf_out_{i}"],
                                   rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.stack(y["gf"]), d["gf_out"],
                               rtol=rtol, atol=atol)
    print(f"parity ok: {b} graphs, all activations within "
          f"rtol={rtol} atol={atol}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("emit")
    e.add_argument("--out", default="parity_case.npz")
    e.add_argument("--seed", type=int, default=0)
    c = sub.add_parser("check")
    c.add_argument("--case", required=True)
    args = ap.parse_args()
    if args.cmd == "emit":
        emit(args.out, args.seed)
    else:
        check(args.case)
