"""ctypes bindings for the native C++ graph runtime (``batcher.cpp``).

Compiled on first use with g++ into the package build dir; every entry point
has a pure-numpy fallback, and tests assert native == python outputs.
Disable with ``GRAPHNETS_TPU_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "batch_coo", "csc_from_coo", "sample_layer",
           "gather_rows", "partition_edges", "refine_partition"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "batcher.cpp")


def _build() -> Optional[str]:
    build_dir = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libgraphnets.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("GRAPHNETS_TPU_NATIVE", "1") == "0":
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64, i32, i8, f32, u64 = (ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int8, ctypes.c_float,
                                  ctypes.c_uint64)
        P = ctypes.POINTER
        lib.gt_batch_coo.restype = i64
        lib.gt_batch_coo.argtypes = [P(i8), P(i64), i64, P(i32), P(i32),
                                     P(i32), i64]
        lib.gt_csc_from_coo.restype = None
        lib.gt_csc_from_coo.argtypes = [P(i64), P(i64), i64, i64, P(i64),
                                        P(i64)]
        lib.gt_sample_layer.restype = i64
        lib.gt_sample_layer.argtypes = [P(i64), P(i64), P(i64), P(i64), i64,
                                        i64, u64, P(i64), P(i64), i64]
        lib.gt_sample_layer_par.restype = i64
        lib.gt_sample_layer_par.argtypes = [P(i64), P(i64), P(i64), P(i64),
                                            i64, i64, u64, P(i64), P(i64),
                                            i64, i64]
        lib.gt_gather_rows_f32_par.restype = None
        lib.gt_gather_rows_f32_par.argtypes = [P(f32), P(i64), i64, i64,
                                               P(f32), i64]
        lib.gt_partition_edges.restype = None
        lib.gt_partition_edges.argtypes = [P(i64), i64, i64, i64, P(i64),
                                           P(i64)]
        lib.gt_refine_partition.restype = i64
        lib.gt_refine_partition.argtypes = [P(i64), P(i64), i64, i64, i64,
                                            i64, P(i64)]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def batch_coo(adjs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical COO for a list of adjacency matrices.

    Returns (senders, receivers, n_edge) with global node ids.
    """
    lib = _load()
    ns = np.array([a.shape[0] for a in adjs], np.int64)
    if lib is None:
        from ..graph import _adj_to_coo
        offs = np.concatenate([[0], np.cumsum(ns)])
        ss, rs, ne = [], [], []
        for i, a in enumerate(adjs):
            s, r = _adj_to_coo(a)
            ss.append(s.astype(np.int32) + np.int32(offs[i]))
            rs.append(r.astype(np.int32) + np.int32(offs[i]))
            ne.append(len(s))
        cat = (lambda x: np.concatenate(x) if x else np.zeros(0, np.int32))
        return cat(ss), cat(rs), np.array(ne, np.int32)
    flat = np.concatenate([np.ascontiguousarray(a, np.int8).ravel()
                           for a in adjs]) if adjs else np.zeros(0, np.int8)
    max_edges = int((ns ** 2).sum())
    senders = np.empty(max_edges, np.int32)
    receivers = np.empty(max_edges, np.int32)
    n_edge = np.empty(len(adjs), np.int32)
    total = lib.gt_batch_coo(_ptr(flat, ctypes.c_int8),
                             _ptr(ns, ctypes.c_int64), len(adjs),
                             _ptr(senders, ctypes.c_int32),
                             _ptr(receivers, ctypes.c_int32),
                             _ptr(n_edge, ctypes.c_int32), max_edges)
    assert total >= 0
    return senders[:total].copy(), receivers[:total].copy(), n_edge


def csc_from_coo(senders: np.ndarray, receivers: np.ndarray, n: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    senders = np.ascontiguousarray(senders, np.int64)
    receivers = np.ascontiguousarray(receivers, np.int64)
    if lib is None:
        order = np.argsort(receivers, kind="stable")
        src = senders[order]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, receivers + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, src
    indptr = np.empty(n + 1, np.int64)
    src = np.empty(len(senders), np.int64)
    lib.gt_csc_from_coo(_ptr(senders, ctypes.c_int64),
                        _ptr(receivers, ctypes.c_int64), len(senders), n,
                        _ptr(indptr, ctypes.c_int64),
                        _ptr(src, ctypes.c_int64))
    return indptr, src


def _default_threads() -> int:
    return max(1, os.cpu_count() or 1)


def sample_layer(indptr: np.ndarray, src: np.ndarray, frontier: np.ndarray,
                 pos: np.ndarray, fanout: int, seed: int,
                 threads: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Sample <= fanout incoming edges per frontier node (native only;
    callers fall back to their own numpy loop when unavailable).

    Parallel across frontier chunks (round 4 — the per-seed loops are
    independent): each node draws from its own (seed, position)-keyed
    stream, so the result is deterministic and independent of ``threads``.
    """
    lib = _load()
    assert lib is not None
    frontier = np.ascontiguousarray(frontier, np.int64)
    pos = np.ascontiguousarray(pos, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int64)
    src = np.ascontiguousarray(src, np.int64)
    max_out = len(frontier) * fanout
    out_src = np.empty(max_out, np.int64)
    out_pos = np.empty(max_out, np.int64)
    k = lib.gt_sample_layer_par(_ptr(indptr, ctypes.c_int64),
                                _ptr(src, ctypes.c_int64),
                                _ptr(frontier, ctypes.c_int64),
                                _ptr(pos, ctypes.c_int64), len(frontier),
                                fanout, np.uint64(seed),
                                _ptr(out_src, ctypes.c_int64),
                                _ptr(out_pos, ctypes.c_int64), max_out,
                                threads or _default_threads())
    assert k >= 0
    return out_src[:k].copy(), out_pos[:k].copy()


def gather_rows(feat: np.ndarray, idx: np.ndarray,
                out: Optional[np.ndarray] = None,
                threads: Optional[int] = None) -> np.ndarray:
    """Threaded f32 row gather ``out[i] = feat[idx[i]]`` (feature assembly
    for sampled subgraphs; numpy fancy indexing is single-threaded).
    Falls back to numpy when the native lib is unavailable."""
    idx = np.ascontiguousarray(idx, np.int64)
    feat = np.ascontiguousarray(feat, np.float32)
    lib = _load()
    if out is None:
        out = np.empty((len(idx), feat.shape[1]), np.float32)
    if lib is None:
        out[:len(idx)] = feat[idx]
        return out
    lib.gt_gather_rows_f32_par(_ptr(feat, ctypes.c_float),
                               _ptr(idx, ctypes.c_int64), len(idx),
                               feat.shape[1], _ptr(out, ctypes.c_float),
                               threads or _default_threads())
    return out


def partition_edges(receivers: np.ndarray, nodes_per_shard: int,
                    num_shards: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shard counts + stable shard-grouped permutation of edge ids."""
    lib = _load()
    receivers = np.ascontiguousarray(receivers, np.int64)
    if lib is None:
        owner = np.minimum(receivers // nodes_per_shard, num_shards - 1)
        counts = np.bincount(owner, minlength=num_shards).astype(np.int64)
        perm = np.argsort(owner, kind="stable").astype(np.int64)
        return counts, perm
    counts = np.empty(num_shards, np.int64)
    perm = np.empty(len(receivers), np.int64)
    lib.gt_partition_edges(_ptr(receivers, ctypes.c_int64), len(receivers),
                           nodes_per_shard, num_shards,
                           _ptr(counts, ctypes.c_int64),
                           _ptr(perm, ctypes.c_int64))
    return counts, perm


def refine_partition(indptr: np.ndarray, adj: np.ndarray,
                     assign: np.ndarray, num_shards: int, cap: int,
                     passes: int = 8) -> Tuple[np.ndarray, int]:
    """Greedy min-edge-cut refinement of a node->shard assignment.

    ``indptr``/``adj``: undirected CSR (both edge directions).  Moves each
    node to the plurality shard of its neighbors when that strictly reduces
    the cut and the target shard holds < ``cap`` nodes.  Returns the refined
    assignment (copy) and the number of moves.
    """
    assign = np.ascontiguousarray(assign, np.int64).copy()
    indptr = np.ascontiguousarray(indptr, np.int64)
    adj = np.ascontiguousarray(adj, np.int64)
    N = len(assign)
    lib = _load()
    if lib is not None:
        moves = lib.gt_refine_partition(
            _ptr(indptr, ctypes.c_int64), _ptr(adj, ctypes.c_int64), N,
            num_shards, cap, passes, _ptr(assign, ctypes.c_int64))
        return assign, int(moves)
    counts = np.bincount(assign, minlength=num_shards)
    moves = 0
    for _ in range(passes):
        moved = 0
        for v in range(N):
            nbrs = adj[indptr[v]:indptr[v + 1]]
            if len(nbrs) == 0:
                continue
            hist = np.bincount(assign[nbrs], minlength=num_shards)
            cur = assign[v]
            ok = (hist > hist[cur]) & (counts < cap)
            ok[cur] = False
            if ok.any():
                best = int(np.argmax(np.where(ok, hist, -1)))
                counts[cur] -= 1
                counts[best] += 1
                assign[v] = best
                moved += 1
                moves += 1
        if moved == 0:
            break
    return assign, moves
