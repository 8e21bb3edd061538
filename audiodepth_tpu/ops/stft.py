"""MXU-native STFT / Mel-spectrogram ops.

TPU-first design: instead of an FFT, the short-time transform is expressed as
one matmul per channel — frames [.., n_frames, win_length] × a precomputed
windowed DFT basis [win_length, 2*n_freq] — which XLA tiles directly onto the
MXU. Because the analysis window (win_length=64) is much shorter than the FFT
size (n_fft=512), the basis only spans the window's support: the zero-padded
region of each frame contributes nothing, cutting FLOPs by n_fft/win_length
(8x for the BatVision settings) versus a full-frame DFT.

Conventions match the reference front end (torchaudio defaults used by
dataloader/BatvisionV2_Dataset.py:177-197 and BatvisionV1_Dataset.py:86-95):
  * center=True with reflect padding of n_fft//2 samples per side,
  * periodic Hann window of win_length, zero-padded symmetrically to n_fft,
  * power=1.0 (magnitude),
  * HTK mel scale, no filterbank normalization, f_min=20, f_max=20000.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window_periodic(win_length: int,
                         dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(dtype)


def stft_basis(n_fft: int, win_length: int, dtype=np.float32) -> np.ndarray:
    """Windowed real-DFT basis restricted to the window support.

    The centered window occupies frame positions [off, off + win_length) with
    off = (n_fft - win_length) // 2. For frequency bin k:
        X[k] = sum_m frame[off+m] * w[m] * exp(-2πi k (off+m) / n_fft)
    so the basis row for sample m carries the phase of absolute position
    off+m. Returns [win_length, 2*n_freq] with cos block then -sin block
    (real, imag parts of X).
    """
    n_freq = n_fft // 2 + 1
    off = (n_fft - win_length) // 2
    w = hann_window_periodic(win_length).astype(np.float64)
    m = np.arange(win_length, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * k * (off + m) / n_fft
    cos = np.cos(phase) * w[:, None]
    sin = -np.sin(phase) * w[:, None]
    return np.concatenate([cos, sin], axis=1).astype(dtype)


def num_frames(length: int, hop_length: int) -> int:
    """Frame count with center=True (torch.stft): 1 + length // hop."""
    return 1 + length // hop_length


def _reflect_pad_last(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "win_length", "hop_length",
                                    "dtype"))
def magnitude_stft(
    waveform: jnp.ndarray,
    n_fft: int = 512,
    win_length: int = 64,
    hop_length: int = 16,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Magnitude STFT of [..., L] → [..., n_freq, n_frames] (power=1.0).

    Equivalent to torchaudio.transforms.Spectrogram(n_fft, win_length,
    hop_length, power=1.0) within fp32 tolerance.
    """
    length = waveform.shape[-1]
    n_freq = n_fft // 2 + 1
    frames_n = num_frames(length, hop_length)
    off = (n_fft - win_length) // 2

    x = _reflect_pad_last(waveform.astype(dtype), n_fft // 2)
    # gather frames: [..., n_frames, win_length]
    starts = np.arange(frames_n) * hop_length + off
    idx = jnp.asarray(starts[:, None] + np.arange(win_length)[None, :])
    frames = x[..., idx]

    basis = jnp.asarray(stft_basis(n_fft, win_length, dtype=np.dtype(dtype)))
    # HIGHEST precision: the front end defines data semantics, so the DFT
    # matmul must be true fp32 even on TPU (default precision is bf16);
    # float64 runs (parity/debug mode) stay float64 end-to-end.
    spec = jnp.matmul(
        frames, basis,
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    re, im = spec[..., :n_freq], spec[..., n_freq:]
    mag = jnp.sqrt(re * re + im * im)
    # [..., n_frames, n_freq] -> [..., n_freq, n_frames]
    return jnp.swapaxes(mag, -1, -2)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freq: int,
    n_mels: int = 32,
    sample_rate: int = 44100,
    f_min: float = 20.0,
    f_max: float = 20000.0,
    norm: Optional[str] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank [n_freq, n_mels], HTK scale, norm=None.

    Matches torchaudio.functional.melscale_fbanks(mel_scale='htk').
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freq)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freq, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "win_length", "hop_length", "n_mels", "sample_rate", "f_min", "f_max", "dtype"),
)
def mel_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = 512,
    win_length: int = 64,
    hop_length: Optional[int] = None,
    n_mels: int = 32,
    sample_rate: int = 44100,
    f_min: float = 20.0,
    f_max: float = 20000.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Magnitude mel spectrogram of [..., L] → [..., n_mels, n_frames].

    Default hop = win_length // 2 (the torchaudio MelSpectrogram default the
    reference relies on at BatvisionV2_Dataset.py:114,187-197).
    """
    if hop_length is None:
        hop_length = win_length // 2
    mag = magnitude_stft(waveform, n_fft=n_fft, win_length=win_length,
                         hop_length=hop_length, dtype=dtype)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    f_min, f_max, dtype=np.dtype(dtype)))
    # [..., n_freq, T] x [n_freq, n_mels] -> [..., n_mels, T]
    mel = jnp.einsum("...ft,fm->...mt", mag, fb, precision=jax.lax.Precision.HIGHEST)
    return mel


def log_minmax_per_channel(spec: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """log(spec + eps) then per-channel min-max normalize to [0, 1].

    Channel axis is -3 ([..., C, F, T]); channels with max == min map to
    zeros (BatvisionV2_Dataset.py:119-132 semantics).
    """
    x = jnp.log(spec + eps)
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    rng = hi - lo
    return jnp.where(rng > 0, (x - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)
