"""Multi-host initialization and cross-host sharding helpers.

The reference has no communication backend at all (SURVEY §2.3: no
NCCL/MPI/Gloo anywhere, single process only).  The TPU-native equivalent is
``jax.distributed`` + XLA collectives: within a pod slice the ring permutes
of ``parallel/ring.py`` ride ICI; across hosts XLA routes over DCN.  This
module is the thin process-level entry point — everything else in the
framework is expressed against the global mesh and needs no per-host code.

Typical pod usage::

    from pytorch3d_pointops_tpu.parallel import multihost, make_mesh
    multihost.initialize()                  # once per process, before jax use
    mesh = make_mesh((jax.process_count(), jax.local_device_count()),
                     ("dp", "sp"))
    # build global arrays from per-host shards:
    x = multihost.host_local_to_global(x_local, mesh, ("dp", "sp", None))
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("pytorch3d_pointops_tpu.multihost")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op if already initialized
    or running single-process).  On Cloud TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.

    Ordering matters: querying ``jax.process_count()`` / ``jax.devices()``
    initializes the backends, after which ``jax.distributed.initialize``
    raises — so prior initialization is detected via
    ``jax.distributed.is_initialized()``, which inspects the distributed
    client WITHOUT touching any backend.  Errors are swallowed only for the
    argument-free auto-detection call (a plain single-process run); explicit
    coordinator arguments re-raise, since a silent single-process fallback
    on a real cluster computes wrong results.
    """
    if jax.distributed.is_initialized():
        return  # distributed runtime already initialized in this process
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise
        # Single-process run (no coordinator configured, nothing
        # auto-detected): nothing to do — every collective in this framework
        # degrades to a copy on a single-device mesh axis.
        # Visible by default: on a real cluster a swallowed init failure
        # means every process silently computes single-process results.
        logger.warning(
            "jax.distributed.initialize auto-detection failed (%s); "
            "proceeding single-process. If this is a multi-host cluster, "
            "pass coordinator_address/num_processes/process_id explicitly.",
            e,
        )
        return
    logger.info(
        "distributed runtime initialized: process %d of %d",
        jax.process_index(),
        jax.process_count(),
    )


def host_local_to_global(
    local_arr,
    mesh: Mesh,
    spec: Sequence[Optional[str]],
):
    """Assemble a global jax.Array from per-host shards.

    ``local_arr`` is this host's slab of the global array (concatenated
    along the first sharded axis, the usual data-loader layout);
    ``spec`` is the PartitionSpec entries for each dimension.
    """
    pspec = P(*spec)
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_arr))


def global_to_host_local(global_arr) -> np.ndarray:
    """Fetch this host's addressable shards of a global array, concatenated
    in shard order — the inverse of :func:`host_local_to_global` for
    checkpoint-style host-side processing."""
    shards = sorted(
        global_arr.addressable_shards, key=lambda s: s.index
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
