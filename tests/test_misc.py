"""Misc surface: tensor-parallel shardings, warmup/compilation cache,
per-graph extractors, examples run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

import graphnets_tpu as gn
from graphnets_tpu.models.gn_core import GNCore
from graphnets_tpu.parallel.mesh import make_mesh
from graphnets_tpu.parallel.tensor_parallel import (param_shardings,
                                                    shard_params)
from graphnets_tpu.util import (get_edge_features, get_graph_features,
                                get_node_features)


def test_tp_shardings(cpu_devices):
    mesh = make_mesh((2, 4), ("data", "model"), devices=cpu_devices)
    core = GNCore((128, 128, 128))
    params = core.init(jax.random.PRNGKey(0))
    sh = param_shardings(params, mesh, min_size=1 << 12)
    # FF weights shard over model axis; LN params replicated
    eff0 = sh["ffwd"]["eff"]["0"]["w"]
    assert eff0.spec == P(None, "model")
    eff1 = sh["ffwd"]["eff"]["1"]["w"]
    assert eff1.spec == P("model", None)
    assert sh["gn1"]["edgeln"]["scale"].spec == P()

    placed = shard_params(params, mesh, min_size=1 << 12)
    leaf = placed["ffwd"]["eff"]["0"]["w"]
    assert len(leaf.sharding.device_set) == 8  # spans the mesh

    # sharded apply still computes correctly
    adj = np.ones((3, 3), int)
    rng = np.random.default_rng(0)
    x = gn.batch({"graphs": [adj], "ef": [rng.normal(size=(9, 128)).astype(np.float32)],
                  "nf": [rng.normal(size=(3, 128)).astype(np.float32)],
                  "gf": np.zeros((1, 128), np.float32)})
    y_ref = core.apply(params, x)
    y_tp = core.apply(placed, x)
    np.testing.assert_allclose(np.asarray(y_tp.nf), np.asarray(y_ref.nf),
                               rtol=1e-5, atol=1e-5)


def test_warmup_and_cache(tmp_path):
    from graphnets_tpu.utils.warmup import enable_compilation_cache, warmup
    d = enable_compilation_cache(str(tmp_path / "xla_cache"))
    warmup(dims=(8, 8, 8))
    assert d


def test_per_graph_extractors():
    adjs = [np.array([[1, 1], [0, 1]]), np.array([[1]])]
    rng = np.random.default_rng(0)
    ef = [rng.normal(size=(3, 2)).astype(np.float32),
          rng.normal(size=(1, 2)).astype(np.float32)]
    nf = [rng.normal(size=(2, 3)).astype(np.float32),
          rng.normal(size=(1, 3)).astype(np.float32)]
    gf = rng.normal(size=(2, 4)).astype(np.float32)
    g = gn.batch({"graphs": adjs, "ef": ef, "nf": nf, "gf": gf})
    np.testing.assert_allclose(get_edge_features(g, 1), ef[1])
    np.testing.assert_allclose(get_node_features(g, 0), nf[0])
    np.testing.assert_allclose(get_graph_features(g, 1), gf[1])


def test_examples_run():
    import subprocess
    import sys
    import os
    env = dict(os.environ)
    # Run the example on CPU without claiming the TPU tunnel: skip the axon
    # sitecustomize registration and pin the platform.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "examples/simple.py"],
                       capture_output=True, text=True, timeout=600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "example 3 ok" in r.stdout


def test_prefetch_iterator():
    from graphnets_tpu.data.prefetch import prefetch
    items = list(prefetch(iter(range(10)), device_put=False))
    assert items == list(range(10))

    def failing():
        yield 1
        raise ValueError("boom")
    it = prefetch(failing(), device_put=False)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_precision_policy():
    from graphnets_tpu.nn.precision import BF16_COMPUTE, cast_params
    adj = np.ones((2, 2), int)
    g = gn.batch({"graphs": [adj], "ef": None,
                  "nf": [np.ones((2, 4), np.float32)], "gf": None})
    gc = BF16_COMPUTE.cast_graph(g)
    assert gc.nf.dtype == jnp.bfloat16
    assert gc.senders.dtype == jnp.int32

    block = gn.GNBlock((0, 4, 0), (3, 3, 3))
    params = block.init(jax.random.PRNGKey(0))
    y = block.apply(params, gc)  # f32 params, bf16 compute
    assert y.nf.dtype == jnp.bfloat16
    p16 = cast_params(params, jnp.bfloat16)
    assert jax.tree_util.tree_leaves(p16)[0].dtype == jnp.bfloat16


def test_parity_harness_roundtrip(tmp_path):
    import subprocess, sys, os
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    case = str(tmp_path / "case.npz")
    r = subprocess.run([sys.executable, "tools/parity_harness.py", "emit",
                       "--out", case], capture_output=True, text=True,
                       timeout=600, cwd=root, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run([sys.executable, "tools/parity_harness.py", "check",
                       "--case", case], capture_output=True, text=True,
                       timeout=600, cwd=root, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "parity ok" in r.stdout


def test_viz_svg_rendering(tmp_path):
    """SVG rendering of sort-task graphs (reference examples/sort/viz.jl)."""
    import numpy as np
    from graphnets_tpu.utils.viz import (render_graph_svg, sort_input_svg,
                                         sort_target_svg)
    import xml.etree.ElementTree as ET

    nf = np.eye(10, dtype=np.float32)[[3, 0, 7, 5]]   # 4 nodes, vocab 10
    svg_in = sort_input_svg(nf)
    root = ET.fromstring(svg_in)
    assert root.tag.endswith("svg")
    assert svg_in.count("<circle") == 4
    assert svg_in.count("<line") == 12        # fully connected, no self loops
    assert ">4<" in svg_in                    # onecold is 1-based: argmax+1

    n = 3
    nodes01 = np.array([0, 1, 0])
    edges01 = np.zeros(n * n, int)
    edges01[0 * n + 1] = 1                    # slot col-major: edge (1 -> 0)
    edges01[2 * n + 2] = 1                    # self loop (2 -> 2)
    svg_t = sort_target_svg(nodes01, edges01)
    ET.fromstring(svg_t)
    assert svg_t.count('fill="green"') >= 1
    assert svg_t.count("<line") == 1 and "stroke=\"green\"" in svg_t

    svg = render_graph_svg(2, [(0, 1)], node_value=lambda i: str(i))
    (tmp_path / "g.svg").write_text(svg)
    ET.fromstring(svg)


def test_core_dims_constructor_errors():
    """GNCore / GNFeedForward / GNGraphNorm reject zero dims at
    construction with the reference rule spelled out
    (``/root/reference/src/gnfeedforward.jl:18``)."""
    import pytest
    from graphnets_tpu import GNCore, GNFeedForward, GNGraphNorm
    for cls in (GNCore, GNFeedForward, GNGraphNorm):
        with pytest.raises(ValueError, match="gnfeedforward.jl:18"):
            cls((8, 0, 8))
    GNCore((8, 8, 8))  # all-positive still constructs


def test_reference_spelled_fn_input_aliases():
    """Reference-spelled input-assembly aliases exist and are the same
    callables (``/root/reference/src/GraphNets.jl:26-32``)."""
    import graphnets_tpu as gn
    assert gn.getedgefninput is gn.get_edge_fn_input
    assert gn.getnodefninput is gn.get_node_fn_input
    assert gn.getgraphfninput is gn.get_graph_fn_input


def test_bench_harness_rejects_nonpositive_timing():
    """The timing harness must never report a non-positive differenced
    time (round 4 wrote "-85.70 ms" to an artifact; that class of capture
    is now a hard error, not a silently-recorded number)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    # bench.py flips use_pallas on at import (it targets the real chip);
    # restore the test-session config so later test files keep the
    # CPU-oracle setting.
    from graphnets_tpu.utils.config import get_config
    cfg = get_config()
    old = (cfg.use_pallas, cfg.pallas_interpret)
    try:
        from bench import differenced_time
    finally:
        cfg.use_pallas, cfg.pallas_interpret = old

    # sane capture passes through
    assert differenced_time({10: 0.1, 100: 0.9}, 10, 100) > 0
    # longer scan "faster" than shorter -> corrupted, must raise
    with pytest.raises(RuntimeError, match="non-positive"):
        differenced_time({3: 0.5, 24: 0.2}, 3, 24)
    with pytest.raises(RuntimeError, match="non-positive"):
        differenced_time({10: 0.4, 100: 0.4}, 10, 100)
