"""Async device prefetch: overlap H2D transfer with compute.

jax.device_put is asynchronous — by keeping `size` batches in flight, the
next batch's host→device transfer rides under the current step's compute
instead of sitting on the critical path (the profiler showed the transfer
dominating the step at bs=256 when done synchronously).
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax


def device_prefetch(
    batches: Iterable,
    mesh=None,
    axis: str = "data",
    size: int = 2,
    encode_units: Optional[float] = None,
) -> Iterator[Any]:
    """Yield device-resident batches, keeping `size` transfers in flight.

    When encode_units is set, batches are packed with the compact transport
    codec (int16 waveform / uint16 depth — data.codec) before transfer,
    cutting host-link bytes ~3.3x; the jitted step decodes on device.
    """
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        # shard_batch, NOT a bare device_put with a global NamedSharding:
        # under multi-process each host holds only its LOCAL rows, and the
        # global array must come from make_array_from_process_local_data
        def place(batch):
            return shard_batch(batch, mesh, axis)
    else:
        dev = jax.devices()[0]

        def place(batch):
            return {k: jax.device_put(v, dev) for k, v in batch.items()}

    if encode_units is not None:
        from .codec import encode_batch

    def put(batch):
        if all(isinstance(v, jax.Array) for v in batch.values()):
            return batch  # already device-resident (e.g. DeviceDatasetCache)
        if encode_units is not None:
            batch = encode_batch(batch, encode_units)
        return place(batch)

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        while len(queue) < size:
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
