"""Numerical-safety guards (SURVEY.md §5 "race detection / sanitizers"
analogue: JAX is pure, so the failure modes are NaN/Inf and out-of-bounds
indices; these helpers make them loud instead of silent)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..graph import GraphsTuple

__all__ = ["checked", "assert_finite", "validate_graph"]


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable fn with checkify (NaN + OOB index + div checks).

    Returns a fn with the same signature; raises on the first failed check.
    """
    errors = errors or (checkify.float_checks | checkify.index_checks
                        | checkify.div_checks)
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check over a pytree (use in tests / debug loops)."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def validate_graph(g: GraphsTuple) -> None:
    """Host-side structural validation of a GraphsTuple (the analogue of the
    reference's ``checks.jl``): index ranges, mask consistency, counts."""
    import numpy as np
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    ng = np.asarray(g.node_graph)
    eg = np.asarray(g.edge_graph)
    nm = np.asarray(g.node_mask)
    em = np.asarray(g.edge_mask)
    gm = np.asarray(g.graph_mask)
    N, E, G = len(nm), len(em), len(gm)
    assert len(s) == E and len(r) == E and len(eg) == E and len(ng) == N
    assert s.min(initial=0) >= 0 and s.max(initial=-1) < max(N, 1)
    assert r.min(initial=0) >= 0 and r.max(initial=-1) < max(N, 1)
    assert eg.max(initial=-1) < G and ng.max(initial=-1) < G
    n_node = np.asarray(g.n_node)
    n_edge = np.asarray(g.n_edge)
    assert n_node.sum() == nm.sum(), "n_node inconsistent with node_mask"
    assert n_edge.sum() == em.sum(), "n_edge inconsistent with edge_mask"
    # canonical order invariant: receivers nondecreasing (CSR-by-dest);
    # required by the Pallas sorted-segment-sum path
    if em.any():
        rr = r[em]
        assert (np.diff(rr) >= 0).all(), "receivers not sorted (canonical order)"
    # real edges reference real nodes
    if em.any():
        assert nm[s[em]].all() and nm[r[em]].all(), (
            "real edge references a padded node")
    if g.slot_shape is not None and g.pad_aliases_real:
        # Uniform slot layout: real slots are a PREFIX of each graph slot's
        # range, and padded edges target their own slot's last node slot.
        ns, es = g.slot_shape
        assert N % ns == 0 and E % es == 0 and N // ns == E // es == G
        for b in range(G):
            nmb = nm[b * ns:(b + 1) * ns]
            emb = em[b * es:(b + 1) * es]
            assert (~nmb[: int(nmb.sum())]).sum() == 0, (
                f"slot {b}: real nodes not a prefix")
            assert (~emb[: int(emb.sum())]).sum() == 0, (
                f"slot {b}: real edges not a prefix")
            pad_e = em[b * es:(b + 1) * es] == False  # noqa: E712
            if pad_e.any():
                tgt = s[b * es:(b + 1) * es][pad_e]
                assert (tgt == (b + 1) * ns - 1).all() and not nm[
                    (b + 1) * ns - 1], (
                    f"slot {b}: padded edges must target the slot's last "
                    "(padding) node slot")
    else:
        # real slots are contiguous at the front (big-graph layout invariant)
        assert (~nm[: int(nm.sum())]).sum() == 0
        assert (~em[: int(em.sum())]).sum() == 0
    for f, count, what in ((g.ef, E, "ef"), (g.nf, N, "nf"),
                           (g.gf, G, "gf")):
        if f is not None:
            assert f.shape[0] == count, f"{what} rows != {what} slots"
