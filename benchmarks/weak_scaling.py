#!/usr/bin/env python
"""Scaling evidence for the edge-partitioned full stack (BASELINE item 4).

Two parts:

A. **Virtual-mesh overhead curve** — the partitioned EncodeProcessDecode
   train step at FIXED per-shard edges for S = 1, 2, 4, 8 shards on the
   8-device CPU mesh.  The host has only 2 physical cores, so the S
   virtual devices' compute serializes: ideal wall time grows ~linearly in
   S.  The signal is therefore the ratio ``T_S / (S * T_1)`` — growth
   ABOVE linear would mean the collectives/host path serializes beyond
   compute.  This validates the implementation scales; it cannot measure
   ICI (no multi-chip hardware in this environment).

B. **Analytic ICI model** — exact per-chip halo traffic counted from the
   HaloPlan (real boundary rows, not capacity), against the stack's
   compute FLOPs, projected onto v5e rates:

   * compute: 3-core stack forward = D^2*(18E + 26N + 22G) FLOPs (matches
     the 142 GFLOP measured headline at D=384/E=16384); train = 3x fwd.
   * sustained rate: measured on the PARTITIONED path itself at S=1 on
     the real chip (round 4: benchmarks/bench_partitioned.py — the
     shard_map body runs the same Pallas kernel stack as the single-chip
     path and its S=1 train step is ~6% FASTER than the unpartitioned
     one): 426.7 GFLOP train step in 4.455 ms = 95.8 TFLOP/s.  The
     efficiency denominator is therefore the real per-chip rate of the
     code that actually runs multi-chip, not an unpartitioned ideal.
   * ICI (public v5e figures): 4 links x 45 GB/s per direction.  The v3
     halo all_to_all rides 2 links of a ring/torus neighborhood —
     assume 90 GB/s aggregate per chip, and also report the worst-case
     single-link 45 GB/s number.
   * comm volume per train step per chip: (fwd all_to_all + its transpose
     in bwd) x n_blocks x real_send_rows x D' x 2 bytes (bf16).

   Efficiency = T_comp / (T_comp + T_comm) (no overlap) and
   T_comp / max(T_comp, T_comm) (perfect overlap; v3 issues the
   all_to_all before independent local matmuls so XLA can overlap).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python benchmarks/weak_scaling.py [--skip-measure]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from graphnets_tpu.utils.config import enable_pallas  # noqa: E402

enable_pallas(False)

from graphnets_tpu.models.encode_process_decode import \
    EncodeProcessDecode  # noqa: E402
from graphnets_tpu.parallel.edge_partition import (  # noqa: E402
    build_halo_plan, partition_edges, partition_edges_mincut)
from graphnets_tpu.parallel.edge_partition_stack import \
    make_partitioned_train_step  # noqa: E402
from graphnets_tpu.parallel.mesh import make_mesh  # noqa: E402
from graphnets_tpu.training.train import TrainState  # noqa: E402

PEAK = 197e12          # v5e bf16 peak FLOP/s
# Measured PARTITIONED-path train rates at S=1 on the real chip, PER
# SHAPE (round 5: the large shape has different bottlenecks — the random
# sender gather and its backward permute dominate — so its rows must not
# borrow the headline shape's rate):
#   headline (N=1024/E=16384/D=384):  426.7 GFLOP / 4.455 ms = 95.8 TF/s
#     (benchmarks/out/bench_partitioned_r4.txt)
#   large   (N=65536/E=1M/D=256):     12.14 TFLOP / 177.28 ms = 68.5 TF/s
#     (benchmarks/out/bench_partitioned_large_r5.txt)
SUSTAINED = {"headline": 95.8e12, "large": 68.5e12}
ICI_LINK = 45e9        # bytes/s, one direction, one link (public v5e)
ICI_NEIGH = 2 * ICI_LINK  # halo all_to_all over a torus neighborhood


def random_graph(rng, n, deg):
    e = n * deg
    return (rng.integers(0, n, e).astype(np.int32),
            np.repeat(np.arange(n, dtype=np.int32), deg))


def grid_graph(n_side, deg=16):
    """2-D lattice: each node receives from its deg nearest neighbors
    (4x4 window) — a locality-rich workload (mesh simulation shape)."""
    n = n_side * n_side
    ij = np.arange(n)
    i, j = ij // n_side, ij % n_side
    senders, receivers = [], []
    offs = [(di, dj) for di in range(-2, 2) for dj in range(-2, 2)]
    for di, dj in offs[:deg]:
        ni = np.clip(i + di, 0, n_side - 1)
        nj = np.clip(j + dj, 0, n_side - 1)
        senders.append((ni * n_side + nj).astype(np.int32))
        receivers.append(ij.astype(np.int32))
    return np.concatenate(senders), np.concatenate(receivers)


def stack_flops(E, N, G, D, n_blocks=3):
    return n_blocks * D * D * (18 * E + 26 * N + 22 * G)


def analytic(tag, senders, receivers, N, S, D, n_blocks, mincut=False):
    rng = np.random.default_rng(0)
    nf = rng.normal(size=(N, 8)).astype(np.float32)
    if mincut:
        pg, _ = partition_edges_mincut(senders, receivers, nf, S)
    else:
        pg = partition_edges(senders, receivers, nf, S)
    plan = build_halo_plan(pg)
    E = len(senders)
    send_rows = float(np.asarray(plan.send_mask).sum()) / S  # per chip
    halo_bytes = 2 * n_blocks * send_rows * D * 2  # fwd + bwd, bf16
    flops = 3 * stack_flops(E // S, N // S, 1, D, n_blocks)  # train = 3x fwd
    t_comp = flops / SUSTAINED[tag.split("/")[0]]
    t_comm = halo_bytes / ICI_NEIGH
    t_comm_1link = halo_bytes / ICI_LINK
    eff_seq = t_comp / (t_comp + t_comm)
    eff_ovl = t_comp / max(t_comp, t_comm)
    eff_seq_1 = t_comp / (t_comp + t_comm_1link)
    out = {
        "workload": tag, "shards": S, "per_shard_edges": E // S,
        "halo_rows_per_chip": send_rows,
        "halo_MB_per_step_per_chip": halo_bytes / 1e6,
        "compute_GFLOP_per_chip": flops / 1e9,
        "t_comp_ms": t_comp * 1e3, "t_comm_ms": t_comm * 1e3,
        "eff_no_overlap": eff_seq, "eff_overlap": eff_ovl,
        "eff_no_overlap_1link": eff_seq_1,
    }
    print(f"{tag:28s} S={S}  halo_rows/chip={send_rows:9.0f}  "
          f"comm={halo_bytes/1e6:8.2f} MB  comp={flops/1e12:6.2f} TFLOP  "
          f"eff(no-ovl)={eff_seq:.3f}  eff(ovl)={eff_ovl:.3f}  "
          f"eff(1-link)={eff_seq_1:.3f}", flush=True)
    return out


def measure(S, per_shard_nodes=256, deg=8, D=64, vocab=16, iters=30):
    devices = jax.devices("cpu")[:S]
    mesh = make_mesh((S,), ("graph",), devices=devices)
    rng = np.random.default_rng(0)
    N = per_shard_nodes * S
    senders, receivers = random_graph(rng, N, deg)
    x_nf = rng.normal(size=(N, vocab)).astype(np.float32)
    y_nf = np.eye(2, dtype=np.float32)[rng.integers(0, 2, N)]
    y_ef = np.eye(2, dtype=np.float32)[rng.integers(0, 2, len(senders))]
    pgx = partition_edges(senders, receivers, x_nf, S)
    pgy = partition_edges(senders, receivers, y_nf, S, ef=y_ef)
    plan = build_halo_plan(pgx)
    model = EncodeProcessDecode(x_dims=(0, vocab, 0), core_dims=(D, D, D),
                                y_dims=(2, 2, 0), n_cores=2)
    opt = optax.adamw(1e-3)
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))
    step = jax.jit(make_partitioned_train_step(model, opt, plan, mesh))
    state, m = step(state, pgx, pgy.nf, pgy.ef)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, pgx, pgy.nf, pgy.ef)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(float(m["loss"]))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-measure", action="store_true")
    args = ap.parse_args()

    results = {"analytic": [], "measured": []}

    # B. analytic ICI model at the two standing configs
    print("== analytic ICI model (v5e: measured partitioned-path rates "
          "95.8 TF/s headline / 68.5 TF/s large, "
          "90 GB/s neighborhood ICI) ==")
    for S in (2, 4, 8, 16):
        rng = np.random.default_rng(1)
        # headline per-chip workload: 1024 nodes x deg 16 per chip
        n = 1024 * S
        s, r = random_graph(rng, n, 16)
        results["analytic"].append(
            analytic("headline/random", s, r, n, S, 384, 3))
    for S in (2, 4, 8, 16):
        # large-graph per-chip workload: 65536 nodes x deg 16 per chip
        n_side = int(np.sqrt(65536 * S))
        s, r = grid_graph(n_side, 16)
        results["analytic"].append(
            analytic("large/grid(locality)", s, r, n_side * n_side, S,
                     256, 3))
    for S in (2, 4, 8):
        rng = np.random.default_rng(2)
        n = 65536 * S
        s, r = random_graph(rng, n, 16)
        results["analytic"].append(
            analytic("large/random(worstcase)", s, r, n, S, 256, 3))

    if not args.skip_measure:
        print("== virtual-mesh overhead curve (2 physical cores -> ideal "
              "is ~linear in S) ==")
        t1 = None
        for S in (1, 2, 4, 8):
            dt = measure(S)
            if t1 is None:
                t1 = dt
            ratio = dt / (S * t1)
            results["measured"].append(
                {"shards": S, "ms_per_step": dt * 1e3,
                 "vs_linear_serialization": ratio})
            print(f"S={S}  {dt*1e3:8.2f} ms/step   T_S/(S*T_1) = "
                  f"{ratio:.2f}", flush=True)

    with open("benchmarks/out/weak_scaling.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote benchmarks/out/weak_scaling.json")


if __name__ == "__main__":
    main()
