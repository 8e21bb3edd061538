"""Golden parity tests: MXU-matmul STFT/Mel front end vs torch.stft formulas."""

import numpy as np
import pytest
import torch

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.frontend import make_frontend, tof_cut_samples
from audiodepth_tpu.ops.stft import (
    hann_window_periodic,
    log_minmax_per_channel,
    magnitude_stft,
    mel_filterbank,
    mel_spectrogram,
)
from audiodepth_tpu.ops.resize import resize_bilinear, resize_nearest_cv2, resize_nearest_cv2_np


def torch_magnitude_stft(wave, n_fft=512, win_length=64, hop_length=16):
    """torchaudio.transforms.Spectrogram(power=1.0) equivalent via torch.stft."""
    x = torch.as_tensor(wave, dtype=torch.float32)
    win = torch.hann_window(win_length, periodic=True)
    out = torch.stft(
        x.reshape(-1, x.shape[-1]),
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return out.abs().reshape(x.shape[:-1] + out.shape[-2:]).numpy()


@pytest.mark.parametrize("length,hop", [(7782, 16), (4000, 32), (1024, 16)])
def test_stft_matches_torch(length, hop):
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(2, 2, length)).astype(np.float32)
    ours = np.asarray(magnitude_stft(wave, n_fft=512, win_length=64, hop_length=hop))
    ref = torch_magnitude_stft(wave, n_fft=512, win_length=64, hop_length=hop)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_stft_frame_count_bv2():
    # BV2 TOF cut at 30m/44.1k: int((60/340)*44100) samples
    cut = tof_cut_samples(30.0, 44100)
    assert cut == 7782
    wave = np.zeros((1, 2, cut), np.float32)
    spec = magnitude_stft(wave, 512, 64, 16)
    assert spec.shape == (1, 2, 257, 1 + cut // 16)


def test_mel_filterbank_properties():
    fb = mel_filterbank(257, 32, 44100, 20.0, 20000.0)
    assert fb.shape == (257, 32)
    assert (fb >= 0).all()
    # every filter has support, peaks at 1 nowhere above 1
    assert (fb.max(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # triangles: each filter's support is contiguous
    for j in range(32):
        nz = np.flatnonzero(fb[:, j] > 0)
        assert (np.diff(nz) == 1).all()


def test_mel_matches_manual_torch():
    """Mel = torch.stft magnitude @ the same HTK filterbank."""
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 2, 7782)).astype(np.float32)
    ours = np.asarray(mel_spectrogram(wave, n_fft=512, win_length=64, n_mels=32))
    mag = torch_magnitude_stft(wave, 512, 64, 32)  # default hop = win//2
    fb = mel_filterbank(257, 32, 44100, 20.0, 20000.0)
    ref = np.einsum("bcft,fm->bcmt", mag, fb)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_log_minmax_semantics():
    rng = np.random.default_rng(2)
    spec = rng.uniform(0, 1e6, size=(1, 2, 16, 16)).astype(np.float32)
    out = np.asarray(log_minmax_per_channel(spec))
    for c in range(2):
        x = np.log(spec[0, c] + 1e-8)
        want = (x - x.min()) / (x.max() - x.min())
        np.testing.assert_allclose(out[0, c], want, rtol=1e-5, atol=1e-6)
    # constant channel -> zeros
    const = np.full((1, 1, 8, 8), 3.0, np.float32)
    assert np.asarray(log_minmax_per_channel(const)).max() == 0.0


def test_resize_bilinear_matches_torch_interpolate():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, 257, 487)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, 256, 256))
    ref = torch.nn.functional.interpolate(
        torch.as_tensor(x), size=(256, 256), mode="bilinear",
        align_corners=False, antialias=True,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_resize_bilinear_upsample_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 2, 32, 244)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, 256, 256))
    ref = torch.nn.functional.interpolate(
        torch.as_tensor(x), size=(256, 256), mode="bilinear",
        align_corners=False, antialias=True,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_nearest_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    depth = rng.uniform(0, 30, size=(480, 640)).astype(np.float32)
    ref = cv2.resize(depth, (256, 256), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(resize_nearest_cv2_np(depth, 256, 256), ref)
    np.testing.assert_array_equal(np.asarray(resize_nearest_cv2(depth, 256, 256)), ref)


@pytest.mark.parametrize("dataset,fmt,expect_norm", [
    ("batvisionv2", "mel_spectrogram", True),
    ("batvisionv2", "spectrogram", True),
    ("batvisionv1", "spectrogram", False),
])
def test_frontend_end_to_end(dataset, fmt, expect_norm):
    cfg = load_config(dataset, overrides={"dataset.audio_format": fmt})
    fe = make_frontend(cfg)
    rng = np.random.default_rng(6)
    n = tof_cut_samples(cfg.dataset.max_depth, cfg.dataset.sample_rate) + 500
    wave = rng.normal(size=(2, 2, n)).astype(np.float32)
    out = np.asarray(fe(wave))
    assert out.shape == (2, 256, 256, 2)
    if expect_norm:
        assert out.min() >= 0.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_frontend_waveform_passthrough():
    cfg = load_config("batvisionv2", overrides={"dataset.audio_format": "waveform"})
    fe = make_frontend(cfg)
    wave = np.zeros((1, 2, 9000), np.float32)
    out = np.asarray(fe(wave))
    assert out.shape == (1, 2, 7782)


def test_fused_pallas_frontend_matches_xla(monkeypatch):
    """Pallas fused mel frontend (interpret mode on CPU) == XLA composition."""
    import jax.numpy as jnp

    from audiodepth_tpu.ops.pallas.fused_frontend import fused_mel_frontend
    from audiodepth_tpu.ops.stft import mel_spectrogram

    rng = np.random.default_rng(8)
    wave = rng.normal(size=(2, 2, 4000)).astype(np.float32)
    ref = log_minmax_per_channel(mel_spectrogram(jnp.asarray(wave)))
    got = fused_mel_frontend(jnp.asarray(wave), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
