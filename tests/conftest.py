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


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
