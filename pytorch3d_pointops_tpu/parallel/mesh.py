"""Mesh construction and sharding helpers.

The reference library has no distributed layer at all (SURVEY §2.3: no
torch.distributed anywhere); scaling here is TPU-native by design:

* **Data parallelism (dp)**: the batch axis N of padded clouds shards over a
  mesh axis; every op in ``ops/`` is batch-parallel so this needs nothing but
  sharding annotations — XLA inserts the gradient psums.
* **Point/sequence parallelism (sp)**: the point axes shard over a mesh axis
  and reference clouds rotate around the ring (``parallel/ring.py``), the
  point-cloud analog of ring attention.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("dp", "sp"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With no ``shape``, all devices go to the first axis.  E.g.
    ``make_mesh((2, 4))`` -> 2-way dp x 4-way sp.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for (N, P, D) padded clouds: batch over ``axis``."""
    return NamedSharding(mesh, P(axis, None, None))


def point_sharding(
    mesh: Mesh, point_axis: str = "sp", batch_axis: Optional[str] = None
) -> NamedSharding:
    """Sharding for (N, P, D) padded clouds: points over ``point_axis`` and
    optionally batch over ``batch_axis``."""
    return NamedSharding(mesh, P(batch_axis, point_axis, None))


def shard_pointclouds(pc, mesh: Mesh, axis: str = "dp"):
    """Device-put a Pointclouds pytree with the batch axis sharded."""
    from jax.sharding import NamedSharding

    def put(x):
        if x.ndim >= 1:
            spec = P(axis, *(None,) * (x.ndim - 1))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, pc)
