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
    """The row range of the global batch this host should load.

    Requires an evenly divisible global batch — silently flooring would
    drop the remainder rows on every host. Ragged (eval-tail) batches go
    through local_shard, which pads identically on every host.
    """
    nproc = jax.process_count()
    if global_batch_size % nproc != 0:
        raise ValueError(
            f"global batch {global_batch_size} is not divisible by "
            f"{nproc} processes; use local_shard for ragged eval batches"
        )
    per_host = global_batch_size // nproc
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def local_shard(global_batch: dict, axis_size: int) -> dict:
    """This host's rows of a (possibly ragged) GLOBAL batch, shardable.

    Pads the global batch up to the next multiple of the data-axis size
    (pad rows repeat row 0 and carry _valid=0 — mesh.pad_batch_to), then
    returns this host's contiguous row range. Every host computes the
    identical padding from the same global batch, so the sharded global
    array is well-defined; Engine.eval_step zeroes pad-row metrics via
    the mask. Closes the round-2 gap where ragged multi-process eval
    tails were replicated from host-DIVERGENT local reads.
    """
    from .mesh import pad_batch_to

    nproc = jax.process_count()
    if axis_size % nproc != 0:
        raise ValueError(f"data axis {axis_size} not divisible by {nproc} processes")
    rows = next(iter(global_batch.values())).shape[0]
    target = -(-rows // axis_size) * axis_size
    padded = pad_batch_to(global_batch, target)
    per_host = target // nproc
    start = jax.process_index() * per_host
    return {k: np.asarray(v)[start:start + per_host] for k, v in padded.items()}
