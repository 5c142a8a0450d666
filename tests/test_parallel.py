"""Multi-device tests on the virtual 8-CPU mesh: data-parallel training and
edge-partitioned graph parallelism (correctness vs the single-device path).

The reference has no distributed tests (SURVEY.md §4) — these set the model
the driver's ``dryrun_multichip`` also exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graphnets_tpu as gn
from graphnets_tpu.models.encode_process_decode import EncodeProcessDecode
from graphnets_tpu.parallel.data_parallel import (make_dp_train_step,
                                                  shard_batch, stack_shards)
from graphnets_tpu.parallel.edge_partition import (gn_block_partitioned,
                                                   partition_edges)
from graphnets_tpu.parallel.mesh import make_mesh
from graphnets_tpu.data.sort_task import SortTaskConfig, get_batch, \
    sort_pad_spec
from graphnets_tpu.training.train import TrainState, make_train_step


def _mesh(cpu_devices, n=8, names=("data",)):
    return make_mesh((n,), names, devices=cpu_devices)


def test_dp_train_step_runs(cpu_devices):
    mesh = _mesh(cpu_devices)
    cfg = SortTaskConfig(vocab_size=8, min_nodes=2, max_nodes=4,
                         batch_size=2)
    pad = sort_pad_spec(cfg)
    rng = np.random.default_rng(0)
    shards_x, shards_y = [], []
    for _ in range(8):
        x, y = get_batch(rng, cfg, pad)
        shards_x.append(x)
        shards_y.append(y)
    X = shard_batch(stack_shards(shards_x), mesh)
    Y = shard_batch(stack_shards(shards_y), mesh)

    model = EncodeProcessDecode((0, cfg.vocab_size, 0), (16, 16, 16),
                                (2, 2, 0), n_cores=1)
    opt = optax.adamw(1e-3)
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))
    step = make_dp_train_step(model, opt, mesh)
    state2, metrics = step(state, X, Y)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_dp_matches_single_device(cpu_devices):
    """DP gradient step over 4 shards == single-process step over the same
    batches (mean loss, same params update)."""
    mesh = _mesh(cpu_devices, 4)
    cfg = SortTaskConfig(vocab_size=6, min_nodes=2, max_nodes=3,
                         batch_size=2)
    pad = sort_pad_spec(cfg)
    rng = np.random.default_rng(1)
    shards = [get_batch(rng, cfg, pad) for _ in range(4)]
    X = stack_shards([s[0] for s in shards])
    Y = stack_shards([s[1] for s in shards])

    model = EncodeProcessDecode((0, cfg.vocab_size, 0), (8, 8, 8),
                                (2, 2, 0), n_cores=1)
    opt = optax.sgd(1e-2)
    state0 = TrainState.create(model, opt, jax.random.PRNGKey(2))

    dp_step = make_dp_train_step(model, opt, mesh)
    state_dp, m_dp = dp_step(state0, shard_batch(X, mesh),
                             shard_batch(Y, mesh))

    # Single-device reference: mean loss over the same 4 shard-batches.
    from graphnets_tpu.training.losses import graph_loss_nf_ef as _loss

    def loss_of(params):
        losses = []
        for x, y in shards:
            pred = model.apply(params, x)
            losses.append(_loss(pred, y))
        return jnp.mean(jnp.stack(losses))
    loss, grads = jax.value_and_grad(loss_of)(state0.params)
    updates, _ = opt.update(grads, state0.opt_state, state0.params)
    params_ref = optax.apply_updates(state0.params, updates)

    np.testing.assert_allclose(float(m_dp["loss"]), float(loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_partitioned_matches_single_device(cpu_devices):
    """Edge-partitioned GNBlock over 8 shards == unpartitioned GNBlock on
    the same single large graph."""
    mesh = _mesh(cpu_devices, 8, names=("graph",))
    rng = np.random.default_rng(3)
    N, avg_deg, dn, de, dg = 64, 4, 6, 5, 3
    E = N * avg_deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, dn)).astype(np.float32)
    ef = rng.normal(size=(E, de)).astype(np.float32)
    gf = rng.normal(size=(dg,)).astype(np.float32)

    block = gn.GNBlock((de, dn, dg), (7, 8, 9))
    params = block.init(jax.random.PRNGKey(4))

    # --- single-device reference via GraphsTuple ------------------------
    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(ef), nf=jnp.asarray(nf), gf=jnp.asarray(gf)[None],
    )
    y_ref = block.apply(params, g)

    # --- partitioned path ------------------------------------------------
    pg = partition_edges(senders, receivers, nf, num_shards=8, ef=ef, gf=gf,
                         edge_pad_multiple=8)
    out = gn_block_partitioned(block, params, pg, mesh)

    npad = pg.nodes_per_shard
    nf_out = np.asarray(out.nf).reshape(8 * npad, -1)
    nm = np.asarray(pg.node_mask).reshape(-1)
    np.testing.assert_allclose(nf_out[nm], np.asarray(y_ref.nf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.gf)[0],
                               np.asarray(y_ref.gf)[0],
                               rtol=1e-4, atol=1e-5)
    # Edge outputs: pg.edge_index maps each shard slot (receiver-sorted
    # canonical order) back to the input edge array.
    owner = np.minimum(receivers // npad, 7)
    ef_ref = np.asarray(y_ref.ef)
    ef_out = np.asarray(out.ef)
    em = np.asarray(pg.edge_mask)
    ei = pg.edge_index
    for s in range(8):
        k = int((ei[s] >= 0).sum())
        assert k == int((owner == s).sum())
        np.testing.assert_allclose(ef_out[s, :k], ef_ref[ei[s, :k]],
                                   rtol=1e-4, atol=1e-5)
        assert em[s, :k].all() and not em[s, k:].any()


def test_halo_alltoall_matches_allgather(cpu_devices):
    """v2 boundary all-to-all == v1 all-gather == unpartitioned block."""
    from graphnets_tpu.parallel.edge_partition import (
        build_halo_plan, gn_block_partitioned_halo)
    mesh = _mesh(cpu_devices, 8, names=("graph",))
    rng = np.random.default_rng(11)
    N, deg, dn, de, dg = 64, 4, 6, 5, 3
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, dn)).astype(np.float32)
    ef = rng.normal(size=(E, de)).astype(np.float32)
    gf = rng.normal(size=(dg,)).astype(np.float32)

    block = gn.GNBlock((de, dn, dg), (7, 8, 9))
    params = block.init(jax.random.PRNGKey(12))

    pg = partition_edges(senders, receivers, nf, num_shards=8, ef=ef, gf=gf,
                         edge_pad_multiple=8)
    plan = build_halo_plan(pg)
    out_v1 = gn_block_partitioned(block, params, pg, mesh)
    out_v2 = gn_block_partitioned_halo(block, params, pg, plan, mesh)
    np.testing.assert_allclose(np.asarray(out_v2.nf), np.asarray(out_v1.nf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_v2.gf), np.asarray(out_v1.gf),
                               rtol=1e-5, atol=1e-5)
    em = np.asarray(pg.edge_mask)
    np.testing.assert_allclose(np.asarray(out_v2.ef)[em],
                               np.asarray(out_v1.ef)[em],
                               rtol=1e-5, atol=1e-5)


def test_edge_partitioned_gradients(cpu_devices):
    """Gradients flow through the shard_map halo exchange and match the
    unpartitioned block's gradients."""
    mesh = _mesh(cpu_devices, 4, names=("graph",))
    rng = np.random.default_rng(21)
    N, deg, dn, de, dg = 32, 3, 4, 3, 2
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, dn)).astype(np.float32)
    ef = rng.normal(size=(E, de)).astype(np.float32)
    gf = rng.normal(size=(dg,)).astype(np.float32)

    block = gn.GNBlock((de, dn, dg), (5, 6, 7))
    params = block.init(jax.random.PRNGKey(22))
    pg = partition_edges(senders, receivers, nf, num_shards=4, ef=ef, gf=gf,
                         edge_pad_multiple=8)

    def loss_part(p):
        out = gn_block_partitioned(block, p, pg, mesh)
        nm = pg.node_mask
        return jnp.sum(jnp.where(nm[..., None], out.nf, 0.0) ** 2)

    g_full = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(ef), nf=jnp.asarray(nf), gf=jnp.asarray(gf)[None])

    def loss_ref(p):
        return jnp.sum(block.apply(p, g_full).nf ** 2)

    grads_p = jax.grad(loss_part)(params)
    grads_r = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_corelist_matches_sequential(cpu_devices):
    """GPipe pipeline over 4 stages == sequential GNCoreList per microbatch."""
    from graphnets_tpu.parallel.pipeline import PipelinedCoreList
    mesh = _mesh(cpu_devices, 4, names=("pipe",))
    dims = (6, 6, 6)
    pipe = PipelinedCoreList(tuple(gn.GNCore(dims) for _ in range(4)),
                             num_stages=4)
    params = pipe.init(jax.random.PRNGKey(31))

    rng = np.random.default_rng(30)
    M = 6
    micros = []
    for _ in range(M):
        adjs = [np.ones((3, 3), int), np.ones((2, 2), int)]
        micros.append(gn.batch({
            "graphs": adjs,
            "ef": [rng.normal(size=(9, 6)).astype(np.float32),
                   rng.normal(size=(4, 6)).astype(np.float32)],
            "nf": [rng.normal(size=(3, 6)).astype(np.float32),
                   rng.normal(size=(2, 6)).astype(np.float32)],
            "gf": rng.normal(size=(2, 6)).astype(np.float32),
        }, pad=gn.PadSpec(8, 16, 3)))
    stacked = stack_shards(micros)

    out = pipe.apply(params, stacked, mesh)

    # sequential reference: stage s params = params[s]
    for m in range(M):
        g = micros[m]
        for s in range(4):
            sp = jax.tree_util.tree_map(lambda x: x[s], params)
            g = gn.GNCore((6, 6, 6)).apply(sp["0"], g)
        np.testing.assert_allclose(np.asarray(out.nf)[m], np.asarray(g.nf),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.ef)[m], np.asarray(g.ef),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_gradients(cpu_devices):
    from graphnets_tpu.parallel.pipeline import PipelinedCoreList
    mesh = _mesh(cpu_devices, 2, names=("pipe",))
    dims = (4, 4, 4)
    pipe = PipelinedCoreList(tuple(gn.GNCore(dims) for _ in range(2)),
                             num_stages=2)
    params = pipe.init(jax.random.PRNGKey(33))
    rng = np.random.default_rng(34)
    micros = []
    for _ in range(3):
        adjs = [np.ones((2, 2), int)]
        micros.append(gn.batch({
            "graphs": adjs,
            "ef": [rng.normal(size=(4, 4)).astype(np.float32)],
            "nf": [rng.normal(size=(2, 4)).astype(np.float32)],
            "gf": rng.normal(size=(1, 4)).astype(np.float32),
        }, pad=gn.PadSpec(4, 8, 2)))
    stacked = stack_shards(micros)

    def loss(p):
        out = pipe.apply(p, stacked, mesh)
        return jnp.sum(out.nf ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_bfs_partition_reduces_halo_and_matches(cpu_devices):
    """On a ring lattice, BFS-ordered partitioning shrinks the boundary set
    vs a random node labeling, and the computation still matches."""
    from graphnets_tpu.parallel.edge_partition import (
        build_halo_plan, gn_block_partitioned_halo, partition_edges_locality)
    mesh = _mesh(cpu_devices, 4, names=("graph",))
    rng = np.random.default_rng(41)
    N = 64
    # ring lattice with neighbor edges, then scramble the labels
    base_s, base_r = [], []
    for v in range(N):
        for d in (1, 2):
            base_s += [v, (v + d) % N]
            base_r += [(v + d) % N, v]
    relabel = rng.permutation(N)
    senders = relabel[np.array(base_s)].astype(np.int32)
    receivers = relabel[np.array(base_r)].astype(np.int32)
    E = len(senders)
    nf = rng.normal(size=(N, 5)).astype(np.float32)
    ef = rng.normal(size=(E, 4)).astype(np.float32)
    gf = rng.normal(size=(3,)).astype(np.float32)

    pg_rand = partition_edges(senders, receivers, nf, 4, ef=ef, gf=gf,
                              edge_pad_multiple=8)
    plan_rand = build_halo_plan(pg_rand)
    pg_bfs, order = partition_edges_locality(senders, receivers, nf, 4,
                                             ef=ef, gf=gf,
                                             edge_pad_multiple=8)
    plan_bfs = build_halo_plan(pg_bfs)
    assert plan_bfs.halo_size < plan_rand.halo_size, (
        plan_bfs.halo_size, plan_rand.halo_size)

    block = gn.GNBlock((4, 5, 3), (6, 7, 8))
    params = block.init(jax.random.PRNGKey(42))
    out = gn_block_partitioned_halo(block, params, pg_bfs, plan_bfs, mesh)

    # unpartitioned reference on the ORIGINAL labeling
    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(ef), nf=jnp.asarray(nf), gf=jnp.asarray(gf)[None])
    y_ref = block.apply(params, g)

    npad = pg_bfs.nodes_per_shard
    nf_out = np.asarray(out.nf).reshape(4 * npad, -1)
    nm = np.asarray(pg_bfs.node_mask).reshape(-1)
    # shard-block rows correspond to old node ids order[...]
    np.testing.assert_allclose(nf_out[nm], np.asarray(y_ref.nf)[order],
                               rtol=1e-4, atol=1e-5)


def test_halo_overlap_v3_matches_v1(cpu_devices):
    """v3 transform-before-exchange (halo of nf @ W_src rows) == v1
    all-gather == unpartitioned block, including narrow-feature decoders
    where the exchanged rows are narrower than the raw node features."""
    from graphnets_tpu.parallel.edge_partition import (
        build_halo_plan, gn_block_partitioned, gn_block_partitioned_overlap)
    mesh = _mesh(cpu_devices, 8, names=("graph",))
    rng = np.random.default_rng(21)
    N, deg, dn, de, dg = 64, 4, 16, 5, 3
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, dn)).astype(np.float32)
    ef = rng.normal(size=(E, de)).astype(np.float32)
    gf = rng.normal(size=(dg,)).astype(np.float32)

    for out_dims in ((7, 8, 9), (2, 8, 9)):   # wide + narrowing (DE' < DN)
        block = gn.GNBlock((de, dn, dg), out_dims)
        params = block.init(jax.random.PRNGKey(12))
        pg = partition_edges(senders, receivers, nf, num_shards=8, ef=ef,
                             gf=gf, edge_pad_multiple=8)
        plan = build_halo_plan(pg)
        out_v1 = gn_block_partitioned(block, params, pg, mesh)
        out_v3 = gn_block_partitioned_overlap(block, params, pg, plan, mesh)
        np.testing.assert_allclose(np.asarray(out_v3.nf),
                                   np.asarray(out_v1.nf),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_v3.gf),
                                   np.asarray(out_v1.gf),
                                   rtol=1e-5, atol=1e-5)
        em = np.asarray(pg.edge_mask)
        np.testing.assert_allclose(np.asarray(out_v3.ef)[em],
                                   np.asarray(out_v1.ef)[em],
                                   rtol=1e-5, atol=1e-5)


def test_mincut_partition_reduces_cut_and_matches(cpu_devices):
    """Greedy min-edge-cut refinement reduces the edge cut vs the
    BFS-contiguous seed on a community-structured graph, and the resulting
    partitioned block still matches the unpartitioned reference."""
    from graphnets_tpu.parallel.edge_partition import (
        bfs_node_order, build_halo_plan, gn_block_partitioned_halo,
        partition_edges_mincut)
    from graphnets_tpu.graph import GraphsTuple
    from graphnets_tpu.models.gn_block import GNBlock

    rng = np.random.default_rng(7)
    S, C, NC = 8, 8, 16                    # 8 communities of 16 nodes
    N = C * NC
    senders, receivers = [], []
    for c in range(C):                      # dense intra-community edges
        base = c * NC
        s = rng.integers(0, NC, size=NC * 6) + base
        r = rng.integers(0, NC, size=NC * 6) + base
        senders.append(s)
        receivers.append(r)
    inter_s = rng.integers(0, N, size=40)   # sparse inter-community edges
    inter_r = rng.integers(0, N, size=40)
    senders = np.concatenate(senders + [inter_s]).astype(np.int32)
    receivers = np.concatenate(receivers + [inter_r]).astype(np.int32)
    # scramble labels so communities are NOT contiguous in node id
    perm = rng.permutation(N)
    senders, receivers = perm[senders].astype(np.int32), \
        perm[receivers].astype(np.int32)

    nf = rng.normal(size=(N, 6)).astype(np.float32)
    ef = rng.normal(size=(len(senders), 4)).astype(np.float32)
    gf = rng.normal(size=(3,)).astype(np.float32)

    # cut of the BFS-contiguous seed
    order = bfs_node_order(senders, receivers, N)
    inv = np.empty_like(order)
    inv[order] = np.arange(N)
    block_sz = -(-N // S)
    seed_assign = np.minimum(inv // block_sz, S - 1)
    cut_seed = int(np.sum(seed_assign[senders] != seed_assign[receivers]))

    pg, order2 = partition_edges_mincut(senders, receivers, nf, S, ef=ef,
                                        gf=gf, edge_pad_multiple=8)
    # recover the refined assignment from the relabeling
    npad = pg.nodes_per_shard
    new_of_old = np.empty(N, np.int64)
    nm = np.asarray(pg.node_mask)
    pos = 0
    for s in range(S):
        k = int(nm[s].sum())
        new_of_old[order2[pos:pos + k]] = s * npad + np.arange(k)
        pos += k
    assign = new_of_old // npad
    cut_ref = int(np.sum(assign[senders] != assign[receivers]))
    assert cut_ref < cut_seed, (cut_ref, cut_seed)

    # balance cap respected
    counts = np.bincount(assign, minlength=S)
    assert counts.max() <= int(1.05 * block_sz) + 1

    # partitioned block on the mincut layout == unpartitioned block
    block = GNBlock((4, 6, 3), (5, 7, 2))
    params = block.init(jax.random.PRNGKey(3))
    mesh = _mesh(cpu_devices, S, names=("graph",))
    plan = build_halo_plan(pg)
    out = gn_block_partitioned_halo(block, params, pg, plan, mesh)

    E = len(senders)
    g = GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=jnp.asarray(ef), nf=jnp.asarray(nf), gf=jnp.asarray(gf)[None],
    )
    y = block.apply(params, g)
    nf_out = np.asarray(out.nf).reshape(S * npad, -1)
    np.testing.assert_allclose(nf_out[new_of_old], np.asarray(y.nf),
                               rtol=1e-4, atol=1e-4)


def test_partitioned_stack_forward_matches_single_device(cpu_devices):
    """Full EncodeProcessDecode (encoder GNBlock + 2 GNCores + decoder) over
    an edge-partitioned graph == the unpartitioned model on real slots."""
    from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                       partition_edges)
    from graphnets_tpu.parallel.edge_partition_stack import (
        encode_process_decode_partitioned)
    S = 4
    mesh = _mesh(cpu_devices, S, names=("graph",))
    rng = np.random.default_rng(41)
    N, deg, vocab = 48, 3, 12
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, vocab)).astype(np.float32)

    model = EncodeProcessDecode(x_dims=(0, vocab, 0), core_dims=(16, 16, 16),
                                y_dims=(2, 2, 0), n_cores=2)
    params = model.init(jax.random.PRNGKey(42))

    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=None, nf=jnp.asarray(nf), gf=None)
    y_ref = model.apply(params, g)

    pg = partition_edges(senders, receivers, nf, num_shards=S,
                         edge_pad_multiple=8)
    plan = build_halo_plan(pg)
    out = encode_process_decode_partitioned(model, params, pg, plan, mesh)

    npad = pg.nodes_per_shard
    nm = np.asarray(pg.node_mask).reshape(-1)
    nf_out = np.asarray(out.nf).reshape(S * npad, -1)
    np.testing.assert_allclose(nf_out[nm], np.asarray(y_ref.nf),
                               rtol=2e-4, atol=2e-5)
    # edges: pg.edge_index maps shard slots (receiver-sorted) to input rows
    ef_ref = np.asarray(y_ref.ef)
    ef_out = np.asarray(out.ef)
    ei = pg.edge_index
    for s in range(S):
        k = int((ei[s] >= 0).sum())
        np.testing.assert_allclose(ef_out[s, :k], ef_ref[ei[s, :k]],
                                   rtol=2e-4, atol=2e-5)


def test_partitioned_stack_training_matches_single_device(cpu_devices):
    """Edge-partitioned train step (loss + grads through the halo/psum
    collectives + AdamW) == the single-device train step: loss trajectory
    AND params equal over 20 steps at dims (64, 64, 64) — long enough for
    drift through the halo collectives to surface if present."""
    import optax

    from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                       partition_edges)
    from graphnets_tpu.parallel.edge_partition_stack import (
        make_partitioned_train_step)
    from graphnets_tpu.training.losses import graph_loss_nf_ef

    S = 4
    STEPS = 20
    mesh = _mesh(cpu_devices, S, names=("graph",))
    rng = np.random.default_rng(43)
    N, deg, vocab = 64, 4, 8
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, vocab)).astype(np.float32)
    y_nf = np.eye(2, dtype=np.float32)[rng.integers(0, 2, N)]
    y_ef = np.eye(2, dtype=np.float32)[rng.integers(0, 2, E)]

    model = EncodeProcessDecode(x_dims=(0, vocab, 0),
                                core_dims=(64, 64, 64),
                                y_dims=(2, 2, 0), n_cores=2)
    optimizer = optax.adamw(1e-4)

    # --- single-device reference -----------------------------------------
    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=None, nf=jnp.asarray(nf), gf=None)
    y = g.with_features(ef=jnp.asarray(y_ef), nf=jnp.asarray(y_nf), gf=None)

    state_ref = TrainState.create(model, optimizer, jax.random.PRNGKey(44))
    step_ref = jax.jit(make_train_step(model, optimizer,
                                       loss_fn=graph_loss_nf_ef))
    losses_ref = []
    for _ in range(STEPS):
        state_ref, m = step_ref(state_ref, g, y)
        losses_ref.append(float(m["loss"]))

    # --- partitioned path --------------------------------------------------
    pg = partition_edges(senders, receivers, nf, num_shards=S,
                         edge_pad_multiple=8)
    # same partitioner on the TARGETS gives the shard-stacked y layout
    pg_y = partition_edges(senders, receivers, y_nf, num_shards=S,
                           ef=y_ef, edge_pad_multiple=8)
    plan = build_halo_plan(pg)

    state_p = TrainState.create(model, optimizer, jax.random.PRNGKey(44))
    step_p = jax.jit(make_partitioned_train_step(model, optimizer, plan,
                                                 mesh))
    losses_p = []
    for _ in range(STEPS):
        state_p, m = step_p(state_p, pg, pg_y.nf, pg_y.ef)
        losses_p.append(float(m["loss"]))

    # rtol 5e-4: pure f32 accumulation-order drift compounds over 20 steps
    # (per-step agreement is ~1e-6 rel; a real collective bug shows as O(1))
    np.testing.assert_allclose(losses_p, losses_ref, rtol=5e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_partitioned_training_kernels_interpret_match(cpu_devices):
    """Partitioned TRAIN step with the kernel paths engaged (interpreter
    mode, dims 128 so the agg-fused G=1 edge-update runs inside
    shard_map, including its custom backward) == the pure single-device
    train step over 3 steps."""
    import optax

    from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                       partition_edges)
    from graphnets_tpu.parallel.edge_partition_stack import (
        make_partitioned_train_step)
    from graphnets_tpu.training.losses import graph_loss_nf_ef
    from graphnets_tpu.utils.config import enable_pallas

    S = 4
    STEPS = 3
    mesh = _mesh(cpu_devices, S, names=("graph",))
    rng = np.random.default_rng(71)
    N, deg, vocab = 128, 6, 8
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, vocab)).astype(np.float32)
    y_nf = np.eye(2, dtype=np.float32)[rng.integers(0, 2, N)]
    y_ef = np.eye(2, dtype=np.float32)[rng.integers(0, 2, E)]

    model = EncodeProcessDecode(x_dims=(0, vocab, 0),
                                core_dims=(128, 128, 128),
                                y_dims=(2, 2, 0), n_cores=1)
    optimizer = optax.adamw(1e-4)

    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=None, nf=jnp.asarray(nf), gf=None)
    y = g.with_features(ef=jnp.asarray(y_ef), nf=jnp.asarray(y_nf), gf=None)

    state_ref = TrainState.create(model, optimizer, jax.random.PRNGKey(72))
    step_ref = jax.jit(make_train_step(model, optimizer,
                                       loss_fn=graph_loss_nf_ef))
    losses_ref = []
    for _ in range(STEPS):
        state_ref, m = step_ref(state_ref, g, y)
        losses_ref.append(float(m["loss"]))

    pg = partition_edges(senders, receivers, nf, num_shards=S,
                         edge_pad_multiple=128)
    pg_y = partition_edges(senders, receivers, y_nf, num_shards=S,
                           ef=y_ef, edge_pad_multiple=128)
    plan = build_halo_plan(pg)
    # Sanity: this shape engages the agg-fused G=1 kernel in the shard body.
    from graphnets_tpu.ops.pallas.edge_update_g1 import \
        supports_g1_edge_update
    Epad = int(pg.receivers_local.shape[1])
    npad = pg.nodes_per_shard
    N2 = npad + ((32 - npad % 32) or 32)
    assert supports_g1_edge_update(Epad, N2, 128, 128, 4, with_agg=True)

    state_p = TrainState.create(model, optimizer, jax.random.PRNGKey(72))
    enable_pallas(True, interpret=True)
    try:
        step_p = jax.jit(make_partitioned_train_step(model, optimizer,
                                                     plan, mesh))
        losses_p = []
        for _ in range(STEPS):
            state_p, m = step_p(state_p, pg, pg_y.nf, pg_y.ef)
            losses_p.append(float(m["loss"]))
    finally:
        enable_pallas(False, interpret=False)

    np.testing.assert_allclose(losses_p, losses_ref, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_pipeline_gradient_equality(cpu_devices):
    """Pipeline gradients == sequential-stack gradients (same stacked param
    layout), with a microbatch count that is NOT a multiple of the stage
    count (M=5, S=2)."""
    from graphnets_tpu.parallel.pipeline import PipelinedCoreList
    S, M = 2, 5
    mesh = _mesh(cpu_devices, S, names=("pipe",))
    dims = (4, 4, 4)
    pipe = PipelinedCoreList(tuple(gn.GNCore(dims) for _ in range(S)),
                             num_stages=S)
    params = pipe.init(jax.random.PRNGKey(53))
    rng = np.random.default_rng(54)
    micros = []
    for _ in range(M):
        adjs = [np.ones((3, 3), int), np.ones((2, 2), int)]
        micros.append(gn.batch({
            "graphs": adjs,
            "ef": [rng.normal(size=(9, 4)).astype(np.float32),
                   rng.normal(size=(4, 4)).astype(np.float32)],
            "nf": [rng.normal(size=(3, 4)).astype(np.float32),
                   rng.normal(size=(2, 4)).astype(np.float32)],
            "gf": rng.normal(size=(2, 4)).astype(np.float32),
        }, pad=gn.PadSpec(8, 16, 3)))
    stacked = stack_shards(micros)

    def loss_pipe(p):
        out = pipe.apply(p, stacked, mesh)
        return (jnp.sum(out.nf ** 2) + jnp.sum(out.ef ** 2)
                + jnp.sum(out.gf ** 2))

    def loss_seq(p):
        total = 0.0
        for m in range(M):
            g = jax.tree_util.tree_map(lambda x: x[m], stacked)
            for s in range(S):
                sp = jax.tree_util.tree_map(lambda x: x[s], p)
                g = gn.GNCore(dims).apply(sp["0"], g)
            total += (jnp.sum(g.nf ** 2) + jnp.sum(g.ef ** 2)
                      + jnp.sum(g.gf ** 2))
        return total

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_dp_dropout_rng_decorrelated(cpu_devices):
    """DP with dropout > 0: per-shard dropout masks must DIFFER (shard
    index folded into the step rng), and the DP step must equal the
    documented single-device contract — a vmap over the same shards with
    ``rng = fold_in(step_rng, shard_index)``."""
    mesh = _mesh(cpu_devices, 4)
    cfg = SortTaskConfig(vocab_size=6, min_nodes=2, max_nodes=3,
                         batch_size=2)
    pad = sort_pad_spec(cfg)
    rng = np.random.default_rng(7)
    shards = [get_batch(rng, cfg, pad) for _ in range(4)]
    X = stack_shards([s[0] for s in shards])
    Y = stack_shards([s[1] for s in shards])

    model = EncodeProcessDecode((0, cfg.vocab_size, 0), (8, 8, 8),
                                (2, 2, 0), n_cores=1, dropout=0.5)
    opt = optax.sgd(1e-2)
    state0 = TrainState.create(model, opt, jax.random.PRNGKey(5))

    # (a) shards draw different dropout masks: the same shard input run
    # under fold_in(key, 0) vs fold_in(key, 1) must differ.
    _, step_rng = jax.random.split(state0.rng)
    x0 = shards[0][0]
    out0 = model.apply(state0.params, x0, training=True,
                       rng=jax.random.fold_in(step_rng, 0))
    out1 = model.apply(state0.params, x0, training=True,
                       rng=jax.random.fold_in(step_rng, 1))
    assert not np.allclose(np.asarray(out0.nf), np.asarray(out1.nf)), \
        "per-shard dropout masks are identical — rng correlation regressed"

    # (b) DP step == single-device reference under the same contract.
    dp_step = make_dp_train_step(model, opt, mesh, training=True)
    state_dp, m_dp = dp_step(state0, shard_batch(X, mesh),
                             shard_batch(Y, mesh))

    from graphnets_tpu.training.losses import graph_loss_nf_ef as _loss

    def loss_of(params):
        losses = []
        for i, (x, y) in enumerate(shards):
            pred = model.apply(params, x, training=True,
                               rng=jax.random.fold_in(step_rng, i))
            losses.append(_loss(pred, y))
        return jnp.mean(jnp.stack(losses))

    loss, grads = jax.value_and_grad(loss_of)(state0.params)
    updates, _ = opt.update(grads, state0.opt_state, state0.params)
    params_ref = optax.apply_updates(state0.params, updates)

    np.testing.assert_allclose(float(m_dp["loss"]), float(loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_partitioned_stack_kernels_interpret_match(cpu_devices):
    """The partitioned stack with the Pallas kernel paths ENGAGED
    (interpreter mode; dims/pads chosen so the sorted-gather, sorted
    segment-sum, ln_matmul and fused-FFN support gates all pass) == the
    pure-XLA single-device model.  This pins the round-4 unification: the
    multi-chip path runs the same kernel stack as the single-chip path."""
    from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                       partition_edges)
    from graphnets_tpu.parallel.edge_partition_stack import (
        encode_process_decode_partitioned)
    from graphnets_tpu.utils.config import enable_pallas

    S = 4
    mesh = _mesh(cpu_devices, S, names=("graph",))
    rng = np.random.default_rng(61)
    N, deg, vocab = 128, 6, 8          # npad = 32 (%32), Epad -> %128
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, vocab)).astype(np.float32)

    model = EncodeProcessDecode(x_dims=(0, vocab, 0),
                                core_dims=(128, 128, 128),
                                y_dims=(2, 2, 0), n_cores=1)
    params = model.init(jax.random.PRNGKey(62))

    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=None, nf=jnp.asarray(nf), gf=None)
    y_ref = model.apply(params, g)      # pure path (pallas disabled)

    pg = partition_edges(senders, receivers, nf, num_shards=S,
                         edge_pad_multiple=128)
    plan = build_halo_plan(pg)
    # Sanity: this shape actually engages the kernels.
    from graphnets_tpu.ops.pallas.gather import supports_sorted_gather
    from graphnets_tpu.ops.pallas.segment_sum import \
        supports_sorted_segment_sum
    Epad = int(pg.receivers_local.shape[1])
    npad = pg.nodes_per_shard
    assert supports_sorted_gather(Epad, npad, 128, 4)
    assert supports_sorted_segment_sum(Epad, npad + 1, 128)

    enable_pallas(True, interpret=True)
    try:
        out = encode_process_decode_partitioned(model, params, pg, plan,
                                                mesh)
    finally:
        enable_pallas(False, interpret=False)

    nm = np.asarray(pg.node_mask).reshape(-1)
    nf_out = np.asarray(out.nf).reshape(S * npad, -1)
    np.testing.assert_allclose(nf_out[nm], np.asarray(y_ref.nf),
                               rtol=2e-4, atol=2e-5)
    ef_ref = np.asarray(y_ref.ef)
    ef_out = np.asarray(out.ef)
    ei = pg.edge_index
    for s in range(S):
        k = int((ei[s] >= 0).sum())
        np.testing.assert_allclose(ef_out[s, :k], ef_ref[ei[s, :k]],
                                   rtol=2e-4, atol=2e-5)


def test_partitioned_training_agg_gate_off_matches(cpu_devices):
    """GRAPHNETS_TPU_G1_AGG_TRAIN=0 must take effect in the PARTITIONED
    training path too (r5 review fix: the gate was only consulted by the
    single-device block).  With the gate off and kernels on (interpret),
    the partitioned step routes the edge update through the composed
    per-shard path and still equals the pure single-device step."""
    import optax

    from graphnets_tpu.parallel.edge_partition import (build_halo_plan,
                                                       partition_edges)
    from graphnets_tpu.parallel.edge_partition_stack import (
        make_partitioned_train_step)
    from graphnets_tpu.utils.config import enable_pallas, get_config

    S = 2
    mesh = _mesh(cpu_devices, S, names=("graph",))
    rng = np.random.default_rng(81)
    N, deg, vocab = 64, 4, 8
    E = N * deg
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = rng.integers(0, N, size=E).astype(np.int32)
    nf = rng.normal(size=(N, vocab)).astype(np.float32)
    y_nf = np.eye(2, dtype=np.float32)[rng.integers(0, 2, N)]
    y_ef = np.eye(2, dtype=np.float32)[rng.integers(0, 2, E)]

    model = EncodeProcessDecode(x_dims=(0, vocab, 0),
                                core_dims=(128, 128, 128),
                                y_dims=(2, 2, 0), n_cores=1)
    optimizer = optax.adamw(1e-4)

    g = gn.GraphsTuple(
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.zeros((N,), jnp.int32),
        edge_graph=jnp.zeros((E,), jnp.int32),
        n_node=jnp.array([N], jnp.int32), n_edge=jnp.array([E], jnp.int32),
        node_mask=jnp.ones((N,), bool), edge_mask=jnp.ones((E,), bool),
        graph_mask=jnp.ones((1,), bool),
        ef=None, nf=jnp.asarray(nf), gf=None)
    y = g.with_features(ef=jnp.asarray(y_ef), nf=jnp.asarray(y_nf), gf=None)

    state_ref = TrainState.create(model, optimizer, jax.random.PRNGKey(82))
    _, m_ref = jax.jit(make_train_step(model, optimizer))(state_ref, g, y)

    pg = partition_edges(senders, receivers, nf, num_shards=S,
                         edge_pad_multiple=128)
    pg_y = partition_edges(senders, receivers, y_nf, num_shards=S,
                           ef=y_ef, edge_pad_multiple=128)
    plan = build_halo_plan(pg)
    state_p = TrainState.create(model, optimizer, jax.random.PRNGKey(82))
    old_gate = get_config().g1_agg_fusion_training
    enable_pallas(True, interpret=True)
    get_config().g1_agg_fusion_training = False
    try:
        step_p = jax.jit(make_partitioned_train_step(model, optimizer,
                                                     plan, mesh))
        _, m_p = step_p(state_p, pg, pg_y.nf, pg_y.ef)
        loss_p = float(m_p["loss"])
    finally:
        enable_pallas(False, interpret=False)
        get_config().g1_agg_fusion_training = old_gate
    np.testing.assert_allclose(loss_p, float(m_ref["loss"]),
                               rtol=2e-4, atol=1e-6)
