"""Test configuration: run everything on a virtual 8-device CPU backend.

The container's sitecustomize pre-imports jax with the axon TPU plugin, so
``JAX_PLATFORMS=cpu`` in the environment is too late; instead we force 8 host
CPU devices via XLA_FLAGS (the CPU backend initializes lazily, so this works
post-import) and pin the default device to CPU.  Sharding tests build their
mesh from ``jax.devices("cpu")`` explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

_CPU = jax.devices("cpu")[0]
jax.config.update("jax_default_device", _CPU)

# Pallas TPU kernels cannot compile for the CPU test backend; the pure-JAX
# oracle path is what tests verify.  Kernel-math tests opt in to interpreter
# mode explicitly.
from graphnets_tpu.utils.config import enable_pallas  # noqa: E402

enable_pallas(False)

import pytest  # noqa: E402

# Fast/slow split: `pytest -m fast` is the <2-minute CI signal lane; the
# full (unmarked) run stays the merge gate.  Slow = multi-device /
# convergence / kernel-sweep tests, listed explicitly from measured
# `--durations` (refresh with `pytest --durations=40` when the shape of the
# suite changes); whole modules below are slow wholesale.  Anything not
# listed is marked fast, so new tests default into the signal lane until
# measured otherwise.
_SLOW_MODULES = {
    "test_parallel",        # 8-device shard_map equality suites
    "test_sort_training",   # convergence runs
}
_SLOW_TESTS = {
    "test_misc::test_examples_run",
    "test_misc::test_tp_shardings",
    "test_misc::test_parity_harness_roundtrip",
    "test_core::test_corelist_remat_matches",
    "test_core::test_epd_oracle_parity_flagship_dims",
    "test_core::test_encoder_core_decoder_stack",
    "test_core::test_core_shapes",
    "test_core::test_core_batch_invariance",
    "test_pallas_kernels::test_fused_edge_update_matches",
    "test_pallas_kernels::test_gnblock_fused_edge_update_matches_split",
    "test_pallas_kernels::test_gnblock_fused_gather_term_matches",
    "test_pallas_kernels::test_fused_ffn_gradients",
    "test_uniform_layout::test_fused_edge_update_reachable_from_batch",
    "test_uniform_layout::test_gnblock_parity_exact_vs_uniform",
    "test_large_graph::test_node_classification_learns",
    "test_large_graph::test_sampled_subgraph_kernel_path_matches_pure",
    "test_large_graph::test_node_classification_example_runs",
    "test_gnblock::test_gradients_flow",
    "test_checkpoint::test_checkpoint_roundtrip",
    "test_checkpoint::test_checkpoint_keeps_latest",
    "test_device_data::test_device_batch_padding_is_clean",
    "test_fault_tolerance::test_restart_recovers_and_matches",
    "test_misc::test_precision_policy",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        key = f"{mod}::{item.name.split('[')[0]}"
        if mod in _SLOW_MODULES or key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
