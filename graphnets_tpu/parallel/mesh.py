"""Device-mesh helpers.

The reference is single-device (SURVEY.md §2.3: no DP/TP/PP/SP anywhere);
scaling here is TPU-native: ``jax.sharding.Mesh`` + ``NamedSharding`` under
``jit`` (GSPMD inserts the collectives over ICI) and ``shard_map`` for the
explicit edge-partition halo path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "sharded_leading", "P", "Mesh",
           "NamedSharding"]


def make_mesh(axis_sizes: Sequence[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over the given devices (default: all).

    ``make_mesh()`` -> 1-D "data" mesh over every device;
    ``make_mesh((4, 2), ("data", "model"))`` -> 2-D mesh.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    devs = np.asarray(devices[: int(np.prod(axis_sizes))]).reshape(
        tuple(axis_sizes))
    return Mesh(devs, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading array dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))
