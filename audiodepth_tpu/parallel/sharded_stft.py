"""Chunked STFT with halo exchange: the time axis sharded across chips.

For the `waveform` input format and long time-of-flight windows (SURVEY
§2.6 SP row), the STFT time axis is split over a mesh axis: each chip
computes the frames whose window starts fall in its chunk, fetching the
(win_length − hop_length)-sample overlap from its right neighbor with a
single lax.ppermute — the halo rides ICI, everything else is local MXU
matmuls against the windowed DFT basis (ops/stft.py).

Semantics match ops.stft.magnitude_stft (torch.stft conventions) exactly:
the caller-visible output is [..., n_freq, 1 + L // hop].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.stft import stft_basis


def sharded_magnitude_stft(
    waveform: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    n_fft: int = 512,
    win_length: int = 64,
    hop_length: int = 16,
    batch_axis: str = None,
) -> jnp.ndarray:
    """Magnitude STFT of [..., L] with the frame axis sharded over `axis`.

    Each shard computes T/n frames; boundary frames read (win − hop) halo
    samples ppermute'd from the right neighbor.

    batch_axis: optional mesh axis the LEADING dim stays sharded over — the
    production DP×SP layout (batch over 'data', frames over 'model');
    without it the batch is replicated across the mesh.
    """
    from jax import shard_map

    n = mesh.shape[axis]
    length = waveform.shape[-1]
    n_freq = n_fft // 2 + 1
    t_frames = 1 + length // hop_length
    off = (n_fft - win_length) // 2
    halo = win_length - hop_length

    # realign so frame t reads y[t*hop : t*hop + win]
    pad = n_fft // 2
    y = jnp.pad(waveform.astype(jnp.float32),
                [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)], mode="reflect")
    y = y[..., off:]

    # frames per shard and total padded sample length
    t_per = -(-t_frames // n)                       # ceil
    lc = t_per * hop_length                         # chunk length (hop-aligned)
    if lc < halo:
        # the halo exchange forwards each shard's first `halo` samples; a
        # chunk shorter than the halo would make the boundary-frame gather
        # silently clamp-read duplicated edge samples
        raise ValueError(
            f"sharded STFT needs >= win-hop = {halo} samples per shard, got "
            f"{lc} ({t_per} frames x hop {hop_length} over {n} '{axis}' "
            f"shards) — shard the frame axis over fewer devices or use a "
            f"longer signal"
        )
    need = n * lc + halo                            # last frame's window tail
    if y.shape[-1] < need:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, need - y.shape[-1])])
    body = y[..., : n * lc]
    tail = y[..., n * lc : n * lc + halo]           # absolute end, replicated

    basis = jnp.asarray(stft_basis(n_fft, win_length))
    starts = np.arange(t_per) * hop_length
    idx = jnp.asarray(starts[:, None] + np.arange(win_length)[None, :])

    lead = [batch_axis] + [None] * (waveform.ndim - 2)
    spec_in = P(*(lead + [axis]))
    spec_rep = P(*(lead + [None])) if batch_axis else P()
    spec_out = P(*(lead + [None, axis]))

    def local(chunk, tail_rep):
        # chunk: [..., lc] (this shard); fetch right neighbor's first `halo`
        my_halo = chunk[..., :halo]
        recv = jax.lax.ppermute(
            my_halo, axis, perm=[(i + 1, i) for i in range(n - 1)]
        )
        i = jax.lax.axis_index(axis)
        # last shard's right halo is the absolute tail of the padded signal
        recv = jnp.where(i == n - 1, tail_rep, recv)
        ext = jnp.concatenate([chunk, recv], axis=-1)
        frames = ext[..., idx]                       # [..., t_per, win]
        spec = jnp.matmul(
            frames, basis,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        re, im = spec[..., :n_freq], spec[..., n_freq:]
        mag = jnp.sqrt(re * re + im * im)
        return jnp.swapaxes(mag, -1, -2)             # [..., F, t_per]

    out = shard_map(
        local, mesh=mesh,
        in_specs=(spec_in, spec_rep),
        out_specs=spec_out,
    )(body, tail)
    return out[..., :t_frames]
