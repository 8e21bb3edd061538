"""Fused on-device audio front end.

Turns raw binaural waveforms into model-ready NHWC spectrogram tensors in ONE
jitted graph: time-of-flight cut → STFT/Mel (MXU matmuls) → log →
per-channel min-max → bilinear resize. This replaces the reference's
host-side, per-sample torchaudio pipeline (BatvisionV2_Dataset.py:96-137,
BatvisionV1_Dataset.py:74-81) — the CPU hot path identified in SURVEY §3.1 —
with batched device compute.

Sample semantics preserved exactly:
  * BV2 (max_depth set): cut = int((2*max_depth/340)*sr) samples; STFT
    n_fft=512/win=64/hop=16 or Mel(sr=44100, n_fft=512, win=64,
    hop=win//2, n_mels=32, f in [20, 20k]); log(spec+1e-8); per-channel
    min-max to [0,1]; resize to images_size².
  * BV1: full waveform, STFT n_fft=512/win=64/hop=16, NO log/min-max
    (BatvisionV1_Dataset.py:75-78 asymmetry), resize to images_size².

Output layout is NHWC ([B, H, W, C]) — the TPU-native conv layout.

Why there is no separate Pallas kernel here: the front end is three small
MXU matmuls (frames × DFT basis, magnitude × mel filterbank) plus
elementwise log/min-max, all inside the SAME jitted graph as the model —
XLA fuses the elementwise chain into the matmuls, and the whole front end
is <1% of the train step. The hot op that genuinely needed a hand kernel is
the HW×HW cross-attention (ops/pallas/flash_attention.py). The ≥5×/chip
front-end lever from SURVEY §7.6 comes from moving it on-device and fusing
it into the step — which this module is.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops.stft import log_minmax_per_channel, magnitude_stft, mel_spectrogram
from ..ops.resize import resize_bilinear

SPEED_OF_SOUND = 340.0


def tof_cut_samples(max_depth: float, sample_rate: int) -> int:
    """Time-of-flight window: samples for sound to travel 2*max_depth."""
    return int((2.0 * max_depth / SPEED_OF_SOUND) * sample_rate)


def make_frontend(cfg: Config, mesh=None,
                  frame_axis: str = "model",
                  batch_axis: str = "data") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the jitted waveform → NHWC input op for a config.

    The returned fn maps [B, C, L] float waveforms to [B, S, S, C] inputs
    (S = cfg.dataset.images_size). For audio_format='waveform' it returns the
    (cut) waveform unchanged as [B, C, L'].

    mesh: when given and it has `frame_axis`, the plain-STFT path runs
    through parallel.sharded_stft (frame axis sharded over `frame_axis`
    with a ppermute halo exchange, batch staying on `batch_axis`) — the
    SURVEY §2.6 SP row for long time-of-flight waveform windows. The mel
    path keeps local framing (its filterbank matmul immediately contracts
    the frequency axis; sharding frames buys nothing there).
    """
    ds = cfg.dataset
    size = ds.images_size
    is_v1 = ds.name == "batvisionv1"
    fmt = ds.audio_format
    cut = None if is_v1 else tof_cut_samples(ds.max_depth, ds.sample_rate) if ds.max_depth else None
    shard_frames = (
        mesh is not None and frame_axis in mesh.axis_names
        and mesh.shape[frame_axis] > 1 and "spectrogram" in fmt
        and "mel" not in fmt
    )

    # f32 is the TPU data-defining precision; float64 mode (parity/debug)
    # keeps the whole front end in f64 so the driver A/B sees the same
    # input bits torch does (tests/test_driver_parity.py)
    fdt = (jnp.float64 if cfg.mode.compute_dtype == "float64"
           else jnp.float32)

    @jax.jit
    def frontend(waveform: jnp.ndarray) -> jnp.ndarray:
        x = waveform.astype(fdt)
        if cut is not None:
            x = x[..., :cut]
        if "spectrogram" not in fmt:
            return x  # waveform passthrough
        if "mel" in fmt:
            spec = mel_spectrogram(
                x, n_fft=512, win_length=64, n_mels=32,
                sample_rate=ds.sample_rate, f_min=20.0, f_max=20000.0,
                dtype=fdt,
            )
        elif shard_frames:
            from ..parallel.sharded_stft import sharded_magnitude_stft

            spec = sharded_magnitude_stft(
                x, mesh, axis=frame_axis, n_fft=512, win_length=64,
                hop_length=16,
                batch_axis=batch_axis if batch_axis in mesh.axis_names else None,
            )
        else:
            spec = magnitude_stft(x, n_fft=512, win_length=64, hop_length=16,
                                  dtype=fdt)
        if not is_v1:
            spec = log_minmax_per_channel(spec)
        if "resize" in (ds.preprocess or ""):
            spec = resize_bilinear(spec, size, size)
        # [B, C, H, W] -> NHWC
        return jnp.transpose(spec, (0, 2, 3, 1))

    return frontend
