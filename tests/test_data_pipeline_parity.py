"""Executable data-pipeline parity vs the GENUINE reference dataset classes.

The last non-executable parity seam (VERDICT r3 Missing #1): every other
layer is pinned against running reference torch code; here the reference's
dataloader/BatvisionV{1,2}_Dataset.py and SparseDepth_Dataset.py are
imported as-is (via the torchaudio/torchvision shims in tests/ref_shims.py)
and run on fabricated on-disk corpora, and their __getitem__ tensors are
compared against the framework's host loader + jitted device front end for
all paths:

  BV1 spectrogram (no log/minmax, depth_norm, NaN/±inf scrub semantics)
  BV2 spectrogram + mel  (TOF cut, log→per-channel minmax→resize)
  BV2 waveform passthrough
  BV2 camera image
  Sparse depth (torchvision-bilinear target resize) + binned targets

Also pins ops/stft.mel_filterbank against the committed golden fixture
tests/golden/mel_fbank_htk_257x32.npy, generated from the INDEPENDENT
per-filter HTK implementation in ref_shims.htk_fbank_torch — breaking the
previous circular mel test (test_frontend.py used the repo's own fbank).
"""

import os

import numpy as np
import pytest
import torch

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.batvision import BatvisionV1Dataset, BatvisionV2Dataset
from audiodepth_tpu.data.frontend import make_frontend
from audiodepth_tpu.data.sparse_depth import (
    BinnedSparseDepthDataset,
    SparseDepthDataset,
)
from audiodepth_tpu.ops.stft import mel_filterbank
from tests.ref_shims import (
    htk_fbank_torch,
    import_reference_dataloader,
    ref_cfg,
)
from tests.test_batvision_data import write_wav

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "mel_fbank_htk_257x32.npy")
SIZE = 64  # images_size for all corpora (small => fast CPU jit)


def echo_signal(rng, n, sr=44100):
    """Noise + chirp: realistic broadband signal so spectral minima aren't
    pathological for log-domain comparison."""
    t = np.arange(n) / sr
    chirp = 0.4 * np.sin(2 * np.pi * (500.0 + 4000.0 * t) * t)
    return (chirp[None, :] + 0.05 * rng.normal(size=(2, n))).astype(np.float32)


# ------------------------------------------------------------------ fixtures

@pytest.fixture(scope="module")
def refdl():
    return import_reference_dataloader()


@pytest.fixture(scope="module")
def bv2_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bv2corpus")
    rng = np.random.default_rng(7)
    d = root / "Hall"
    for sub in ("audio", "depth", "cam", "sparse_depth_downup_015"):
        (d / sub).mkdir(parents=True)
    import cv2

    rows = []
    for i in range(2):
        depth_mm = rng.uniform(0, 40000, size=(48, 64)).astype(np.float32)
        np.save(d / "depth" / f"d{i}.npy", depth_mm)
        np.save(d / "sparse_depth_downup_015" / f"d{i}.npy", depth_mm * 0.9)
        write_wav(d / "audio" / f"a{i}.wav", echo_signal(rng, 9000))
        cv2.imwrite(str(d / "cam" / f"c{i}.png"),
                    rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
        rows.append(f"Hall/audio,a{i}.wav,Hall/depth,d{i}.npy,Hall/cam,c{i}.png")
    (d / "train.csv").write_text(
        "audio path,audio file name,depth path,depth file name,"
        "camera path,camera file name\n" + "\n".join(rows) + "\n"
    )
    return root


@pytest.fixture(scope="module")
def bv1_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bv1corpus")
    rng = np.random.default_rng(8)
    (root / "seqA").mkdir()
    rows = []
    for i in range(2):
        depth_mm = rng.uniform(-200, 15000, size=(32, 40)).astype(np.float32)
        depth_mm[0, 0] = np.nan
        depth_mm[1, 1] = np.inf
        depth_mm[2, 2] = -np.inf
        np.save(root / "seqA" / f"d{i}.npy", depth_mm)
        sig = echo_signal(rng, 4000)
        np.save(root / "seqA" / f"l{i}.npy", sig[0])
        np.save(root / "seqA" / f"r{i}.npy", sig[1])
        rows.append(f"seqA/d{i}.npy,seqA/l{i}.npy,seqA/r{i}.npy")
    (root / "train.csv").write_text(
        "depth path,audio path left,audio path right\n" + "\n".join(rows) + "\n"
    )
    return root


def ours_bv2(bv2_root, audio_format, use_image=False):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root),
        "dataset.images_size": SIZE,
        "dataset.audio_format": audio_format,
    })
    return cfg, BatvisionV2Dataset(cfg, "train.csv", use_image=use_image)


# ------------------------------------------------------------------- golden

def test_golden_fbank_pins_mel_filterbank():
    """mel_filterbank == committed golden == independent HTK implementation."""
    indep = htk_fbank_torch(257, 20.0, 20000.0, 32, 44100).numpy()
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(indep, golden, rtol=0, atol=1e-7)
    ours = mel_filterbank(257, 32, 44100, 20.0, 20000.0)
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------- BV1 path

def test_bv1_getitem_parity(refdl, bv1_root):
    bv1_mod, _, _ = refdl
    rcfg = ref_cfg(str(bv1_root), "spectrogram", max_depth=12.0,
                   images_size=SIZE, depth_norm=True)
    ref_ds = bv1_mod.BatvisionV1Dataset(rcfg, "train.csv")

    cfg = load_config("batvisionv1", overrides={
        "dataset.dataset_dir": str(bv1_root), "dataset.images_size": SIZE,
    })
    ours_ds = BatvisionV1Dataset(cfg, "train.csv")
    fe = make_frontend(cfg)
    for i in range(2):
        ref_spec, ref_depth = ref_ds[i]
        s = ours_ds.sample(i)
        out = np.asarray(fe(s["waveform"][None]))[0]  # [S, S, 2]
        np.testing.assert_allclose(
            out, ref_spec.numpy().transpose(1, 2, 0), rtol=1e-3, atol=1e-3)
        # depth: INTER_NEAREST + nan_to_num + norm semantics must be EXACT
        np.testing.assert_array_equal(
            s["depth"][..., 0], ref_depth.numpy()[0])


# ----------------------------------------------------------------- BV2 path

@pytest.mark.parametrize("fmt", ["spectrogram", "mel_spectrogram"])
def test_bv2_audio_parity(refdl, bv2_root, fmt):
    _, bv2_mod, _ = refdl
    rcfg = ref_cfg(str(bv2_root), fmt.replace("_", ""), max_depth=30.0,
                   images_size=SIZE)
    ref_ds = bv2_mod.BatvisionV2Dataset(rcfg, "train.csv")

    cfg, ours_ds = ours_bv2(bv2_root, fmt)
    fe = make_frontend(cfg)
    for i in range(2):
        ref_spec, ref_depth = ref_ds[i]
        s = ours_ds.sample(i)
        out = np.asarray(fe(s["waveform"][None]))[0]
        np.testing.assert_allclose(
            out, ref_spec.numpy().transpose(1, 2, 0), rtol=1e-3, atol=2e-3)
        np.testing.assert_array_equal(s["depth"][..., 0], ref_depth.numpy()[0])


def test_bv2_waveform_parity(refdl, bv2_root):
    _, bv2_mod, _ = refdl
    rcfg = ref_cfg(str(bv2_root), "waveform", max_depth=30.0, images_size=SIZE)
    ref_ds = bv2_mod.BatvisionV2Dataset(rcfg, "train.csv")
    cfg, ours_ds = ours_bv2(bv2_root, "waveform")
    fe = make_frontend(cfg)
    ref_wave, _ = ref_ds[0]
    out = np.asarray(fe(ours_ds.sample(0)["waveform"][None]))[0]
    np.testing.assert_allclose(out, ref_wave.numpy(), rtol=0, atol=1e-7)


def test_bv2_image_parity(refdl, bv2_root):
    _, bv2_mod, _ = refdl
    rcfg = ref_cfg(str(bv2_root), "melspectrogram", max_depth=30.0,
                   images_size=SIZE)
    ref_ds = bv2_mod.BatvisionV2Dataset(rcfg, "train.csv", use_image=True)
    cfg, ours_ds = ours_bv2(bv2_root, "mel_spectrogram", use_image=True)
    ref_img, _ = ref_ds[0]
    s = ours_ds.sample(0)
    # ref is CHW, ours NHWC-style HWC; both run genuine cv2 → exact
    np.testing.assert_array_equal(
        s["image"], ref_img.numpy().transpose(1, 2, 0))


# --------------------------------------------------------------- sparse path

def test_sparse_depth_parity(refdl, bv2_root):
    _, _, sd_mod = refdl
    rcfg = ref_cfg(str(bv2_root), "melspectrogram", max_depth=30.0,
                   images_size=SIZE)
    ref_ds = sd_mod.SparseDepthDataset(
        rcfg, "train.csv", sparse_depth_method="downup_015",
        use_original_depth=True)

    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": SIZE,
    })
    ours_ds = SparseDepthDataset(cfg, "train.csv",
                                 sparse_depth_method="downup_015",
                                 use_original_depth=True)
    fe = make_frontend(cfg)
    for i in range(2):
        ref_spec, ref_sparse, ref_orig = ref_ds[i]
        s = ours_ds.sample(i)
        # torchvision-bilinear-resized targets (get_transform(convert=True))
        np.testing.assert_allclose(
            s["depth"][..., 0], ref_sparse.numpy()[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            s["original_depth"][..., 0], ref_orig.numpy()[0],
            rtol=1e-4, atol=1e-4)
        out = np.asarray(fe(s["waveform"][None]))[0]
        np.testing.assert_allclose(
            out, ref_spec.numpy().transpose(1, 2, 0), rtol=1e-3, atol=2e-3)


def test_binned_parity(refdl, bv2_root):
    _, _, sd_mod = refdl
    rcfg = ref_cfg(str(bv2_root), "melspectrogram", max_depth=30.0,
                   images_size=SIZE)
    ref_ds = sd_mod.BinnedDepthDataset(
        rcfg, "train.csv", sparse_depth_method="downup_015",
        n_bins=16, bin_mode="sid")

    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": SIZE,
    })
    ours_ds = BinnedSparseDepthDataset(
        cfg, "train.csv", sparse_depth_method="downup_015",
        n_bins=16, bin_mode="sid")

    # (a) edges + bucketize parity on identical input: EXACT vs torch
    np.testing.assert_allclose(ours_ds.bin_edges,
                               ref_ds.bin_edges.numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours_ds.bin_centers,
                               ref_ds.bin_centers.numpy(), rtol=1e-6)
    probe = np.linspace(0.0, 31.0, 1001).astype(np.float32)
    want = torch.clamp(
        torch.bucketize(torch.from_numpy(probe), ref_ds.bin_edges[1:-1]),
        0, 15).numpy()
    from audiodepth_tpu.data.bins import depth_to_bins_np

    got = depth_to_bins_np(probe, ours_ds.bin_edges)
    np.testing.assert_array_equal(got, want)

    # (b) end-to-end bins: identical up to bilinear fp wobble at boundaries
    _, ref_bins, _ = ref_ds[0]
    mine = ours_ds.sample(0)["bins"]
    diff = mine != ref_bins.numpy()
    assert diff.mean() < 0.005 and np.abs(
        mine.astype(int) - ref_bins.numpy().astype(int)).max() <= 1
