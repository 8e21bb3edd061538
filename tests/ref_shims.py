"""Minimal torchaudio/torchvision shims for running the GENUINE reference
dataset classes (/root/reference/dataloader/*.py) in this image, where
torchaudio and torchvision are absent but torch itself is present.

The shims implement exactly the surface those files touch, with the
semantics of the real libraries' defaults:

  torchaudio.load                  — WAV decode, normalized float (int16/32768)
  torchaudio.transforms.Spectrogram— torch.stft, center=True, reflect pad,
                                     periodic Hann, onesided, |.|^power
  torchaudio.transforms.MelSpectrogram — Spectrogram(hop=win//2 default) ×
                                     HTK triangular fbank, norm=None
  torchvision.transforms.{Compose,ToTensor,Resize} — Resize is bilinear,
                                     half-pixel, antialias=True (the
                                     torchvision ≥0.17 tensor default)

The HTK mel filterbank here is INDEPENDENTLY implemented (scalar per-filter
loop in torch, from the textbook formula mel = 2595·log10(1+f/700)) so that
parity tests against audiodepth_tpu.ops.stft.mel_filterbank are not
circular. tests/golden/mel_fbank_htk_257x32.npy is generated from THIS
implementation (see test_data_pipeline_parity.py::test_golden_fbank).
"""

from __future__ import annotations

import math
import sys
import types

import torch


# ---------------------------------------------------------------- torchaudio

def _load_wav(path, backend=None):
    """torchaudio.load twin: scipy decode + normalize-to-float semantics."""
    import numpy as np
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.ndim == 1:
        data = data[:, None]
    data = data.T
    if data.dtype == np.int16:
        out = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        out = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        out = (data.astype(np.float32) - 128.0) / 128.0
    else:
        out = data.astype(np.float32)
    return torch.from_numpy(out.copy()), sr


class _Spectrogram(torch.nn.Module):
    def __init__(self, n_fft=400, win_length=None, hop_length=None, pad=0,
                 power=2.0, normalized=False, center=True,
                 pad_mode="reflect", onesided=True, **_):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.power = power
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        assert not normalized and pad == 0

    def forward(self, waveform):
        shape = waveform.shape
        spec = torch.stft(
            waveform.reshape(-1, shape[-1]),
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=torch.hann_window(self.win_length, periodic=True),
            center=self.center,
            pad_mode=self.pad_mode,
            normalized=False,
            onesided=self.onesided,
            return_complex=True,
        )
        spec = spec.reshape(shape[:-1] + spec.shape[-2:])
        if self.power is None:
            return spec
        return spec.abs() ** self.power


def htk_fbank_torch(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                    sample_rate: int) -> torch.Tensor:
    """Independent HTK mel filterbank [n_freqs, n_mels], norm=None.

    Scalar per-filter construction from the textbook formula — deliberately
    NOT sharing code with audiodepth_tpu.ops.stft.mel_filterbank so parity
    tests against it are meaningful.
    """
    def hz2mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = [k * (sample_rate / 2.0) / (n_freqs - 1) for k in range(n_freqs)]
    lo_mel, hi_mel = hz2mel(f_min), hz2mel(f_max)
    pts = [mel2hz(lo_mel + i * (hi_mel - lo_mel) / (n_mels + 1))
           for i in range(n_mels + 2)]
    fb = torch.zeros(n_freqs, n_mels, dtype=torch.float64)
    for m in range(n_mels):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            rising = (f - left) / (center - left)
            falling = (right - f) / (right - center)
            fb[k, m] = max(0.0, min(rising, falling))
    return fb.to(torch.float32)


class _MelSpectrogram(torch.nn.Module):
    def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                 hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                 power=2.0, norm=None, mel_scale="htk", **_):
        super().__init__()
        assert norm is None and mel_scale == "htk"
        win_length = win_length if win_length is not None else n_fft
        hop_length = hop_length if hop_length is not None else win_length // 2
        self.spectrogram = _Spectrogram(
            n_fft=n_fft, win_length=win_length, hop_length=hop_length,
            power=power,
        )
        self.fb = htk_fbank_torch(
            n_fft // 2 + 1, f_min, f_max if f_max is not None else sample_rate / 2.0,
            n_mels, sample_rate,
        )

    def forward(self, waveform):
        spec = self.spectrogram(waveform)  # [..., freq, time]
        fb = self.fb.to(spec.dtype)  # f32 normally; follows f64 parity runs
        return torch.matmul(spec.transpose(-1, -2), fb).transpose(-1, -2)


# --------------------------------------------------------------- torchvision

class _Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _ToTensor:
    """torchvision F.to_tensor semantics for ndarray input: HWC→CHW (2-D
    arrays gain a leading channel), uint8 scaled by 1/255, float passthrough."""

    def __call__(self, pic):
        import numpy as np

        if isinstance(pic, torch.Tensor):
            return pic
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        if arr.dtype == np.uint8:
            t = t.to(torch.float32).div(255)
        return t


class _Resize(torch.nn.Module):
    """Bilinear, half-pixel centers, antialias=True (torchvision ≥0.17
    tensor default)."""

    def __init__(self, size, interpolation=None, antialias=True):
        super().__init__()
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def forward(self, x):
        return torch.nn.functional.interpolate(
            x.unsqueeze(0).to(torch.float32), size=self.size,
            mode="bilinear", align_corners=False, antialias=True,
        ).squeeze(0)


# ------------------------------------------------------------------ install

def install_shims():
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")
        tat.Spectrogram = _Spectrogram
        tat.MelSpectrogram = _MelSpectrogram
        ta.transforms = tat
        ta.load = _load_wav
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Compose = _Compose
        tvt.ToTensor = _ToTensor
        tvt.Resize = _Resize
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt


def import_reference_dataloader():
    """Import the GENUINE reference dataset modules with shims injected.

    /root/reference/dataloader has no __init__.py; Python 3 namespace
    packages make `dataloader.X` importable with /root/reference on
    sys.path, and the `.utils_dataset` relative import resolves inside it.
    """
    install_shims()
    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import importlib

    bv1 = importlib.import_module("dataloader.BatvisionV1_Dataset")
    bv2 = importlib.import_module("dataloader.BatvisionV2_Dataset")
    sd = importlib.import_module("dataloader.SparseDepth_Dataset")
    return bv1, bv2, sd


def ref_cfg(dataset_dir: str, audio_format: str, max_depth: float,
            images_size: int, depth_norm: bool = False,
            preprocess: str = "resize"):
    """cfg namespace with the attributes the reference dataloaders read."""
    from types import SimpleNamespace

    return SimpleNamespace(dataset=SimpleNamespace(
        dataset_dir=dataset_dir, audio_format=audio_format,
        max_depth=max_depth, images_size=images_size,
        depth_norm=depth_norm, preprocess=preprocess,
    ))
