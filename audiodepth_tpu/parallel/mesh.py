"""Device mesh + sharding rules.

The reference's only parallelism is single-process DataParallel capped at 4
GPUs (models/unetbaseline_model.py:52-56, train.py:255-283). Here data
parallelism is first-class SPMD: a 1-D ('data',) mesh, batches sharded on
axis 0, parameters/optimizer state replicated; XLA inserts the gradient
all-reduce (and the BatchNorm cross-chip stat reduction) over ICI
automatically. An optional ('data','model') 2-D mesh is supported for the
attention families, where the HW×HW cross-attention is the one op worth
model-sharding.

Multi-host: call jax.distributed.initialize() before make_mesh(); the same
code paths then span slices over DCN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array in a batch pytree, sharded on dim 0.

    Single-process: a plain device_put. Multi-process (jax.distributed):
    the incoming batch holds this HOST'S rows of the global batch
    (multihost.local_batch_slice) — the global array is assembled from the
    per-process shards without any cross-host data movement.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, global_shape)

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_global_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard a batch every host holds IN FULL onto the data axis.

    The multi-process convention for meshes whose non-data axes cross
    process boundaries (e.g. a (2,2) 'data'×'model' mesh over 4 single-chip
    hosts): contiguous per-process row slices no longer tile the data axis
    — the devices holding a given row group belong to several processes.
    Here every host materializes the identical global batch and
    make_array_from_callback hands each device exactly its slice, correct
    for ANY mesh layout.
    """
    sh = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, batch)


def model_axes_cross_processes(mesh: Mesh, data_axis: str = "data") -> bool:
    """True if stepping along any non-data mesh axis changes the owning
    process — the condition under which per-process contiguous batch
    slices stop tiling the data axis (see shard_global_batch)."""
    if jax.process_count() <= 1:
        return False
    devs = mesh.devices
    for i, name in enumerate(mesh.axis_names):
        if name == data_axis or devs.shape[i] == 1:
            continue
        first = np.take(devs, 0, axis=i).ravel()
        second = np.take(devs, 1, axis=i).ravel()
        if any(a.process_index != b.process_index
               for a, b in zip(first, second)):
            return True
    return False


def pad_batch_to(batch: Any, target_rows: int) -> Any:
    """Pad every array's leading dim to target_rows; add a _valid row mask.

    Ragged eval tails (drop_last=False) become shardable batches: pad rows
    repeat row 0 (so decode/forward see well-formed data) and carry
    _valid=0, which Engine.eval_step uses to zero their metrics and
    Engine.evaluate to divide by the true sample count.
    """
    rows = next(iter(batch.values())).shape[0]
    pad = target_rows - rows
    if pad < 0:
        raise ValueError(f"batch of {rows} rows exceeds target {target_rows}")
    # an already-padded batch keeps its mask: its existing pad rows must
    # stay invalid (repeating row 0's mask value would mark them real)
    prior = np.asarray(batch["_valid"], np.float32) if "_valid" in batch \
        else np.ones(rows, np.float32)
    valid = np.concatenate([prior, np.zeros(pad, np.float32)])
    if pad:
        def _pad(x):
            x = np.asarray(x)
            fill = np.broadcast_to(x[:1], (pad,) + x.shape[1:])
            return np.concatenate([x, fill], axis=0)

        batch = {k: _pad(v) for k, v in batch.items()}
    else:
        batch = dict(batch)
    batch["_valid"] = valid
    return batch


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree over the whole mesh (all hosts must pass equal
    values — true for params/optimizer state initialized from the same
    seed)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(sh, x, x.shape)

        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
