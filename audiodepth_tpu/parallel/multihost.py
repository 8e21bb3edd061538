"""Multi-host (multi-slice) initialization helpers.

The reference has no distributed infrastructure (SURVEY §2.6); here
multi-host training is the same SPMD program over a bigger mesh:

    initialize_multihost()            # jax.distributed over DCN
    mesh = make_global_mesh()         # all devices across hosts
    # per-host data loading: each host feeds its local shard of the batch

Within a slice, collectives ride ICI; across slices, DCN. Nothing else in
the framework changes — Engine/pjit code paths are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-based autodetection.

    On Cloud TPU pods the arguments are discovered automatically; pass them
    explicitly for manual clusters.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axis_names: Sequence[str] = ("data",),
                     shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL devices (across hosts). Call after initialize_multihost."""
    devices = jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(tuple(shape)), tuple(axis_names))


def local_batch_slice(global_batch_size: int) -> slice:
    """The row range of the global batch this host should load."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
