"""BatVision loader tests against a fabricated on-disk mini-corpus."""

import os
import wave as wavemod

import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.batvision import (
    BatvisionV1Dataset,
    BatvisionV2Dataset,
    load_wav,
    make_dataset,
)
from audiodepth_tpu.data.frontend import make_frontend, tof_cut_samples


def write_wav(path, data, sr=44100):
    """data: [C, L] float32 in [-1,1] → 16-bit PCM."""
    pcm = (np.clip(data, -1, 1) * 32767).astype(np.int16)
    with wavemod.open(str(path), "wb") as f:
        f.setnchannels(pcm.shape[0])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.T.tobytes())


@pytest.fixture
def bv2_root(tmp_path):
    rng = np.random.default_rng(0)
    for loc in ("Hall", "Office"):
        d = tmp_path / loc
        (d / "audio").mkdir(parents=True)
        (d / "depth").mkdir()
        rows = []
        for i in range(3):
            depth_mm = rng.uniform(0, 40000, size=(48, 64)).astype(np.float32)
            np.save(d / "depth" / f"d{i}.npy", depth_mm)
            wav = rng.normal(0, 0.1, size=(2, 9000)).astype(np.float32)
            write_wav(d / "audio" / f"a{i}.wav", wav)
            rows.append(
                f"{loc}/audio,a{i}.wav,{loc}/depth,d{i}.npy,{loc}/cam,c{i}.png"
            )
        (d / "train.csv").write_text(
            "audio path,audio file name,depth path,depth file name,camera path,camera file name\n"
            + "\n".join(rows) + "\n"
        )
    # a hidden + unzipped dir that must be skipped
    (tmp_path / "__pycache__").mkdir()
    (tmp_path / "X_unzipped").mkdir()
    return tmp_path


def test_bv2_scan_and_sample(bv2_root):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": 64,
    })
    ds = BatvisionV2Dataset(cfg, "train.csv")
    assert len(ds) == 6
    s = ds.sample(0)
    assert s["depth"].shape == (64, 64, 1)
    assert s["depth"].max() <= 30.0 and s["depth"].min() >= 0.0
    cut = tof_cut_samples(30.0, 44100)
    assert s["waveform"].shape == (2, cut)
    # end-to-end through the device front end
    fe = make_frontend(cfg)
    batch = next(ds.batches(2, shuffle=False))
    out = np.asarray(fe(batch["waveform"]))
    assert out.shape == (2, 64, 64, 2)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_bv2_blacklist_and_holdout(bv2_root):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": 64,
    })
    ds = BatvisionV2Dataset(cfg, "train.csv", location_blacklist=["Office"])
    assert len(ds) == 3
    full = BatvisionV2Dataset(cfg, "train.csv")
    hall = full.filter_by_audio_path("Hall")
    assert len(hall) == 3


def test_bv2_missing_csv_warns_and_skips(bv2_root, capsys):
    (bv2_root / "Empty").mkdir()
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": 64,
    })
    ds = BatvisionV2Dataset(cfg, "train.csv")
    assert len(ds) == 6
    assert "skipping location Empty" in capsys.readouterr().out


@pytest.fixture
def bv1_root(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "seqA").mkdir()
    (tmp_path / "seqB").mkdir()
    rows = []
    for i, loc in enumerate(["seqA", "seqA", "seqB"]):
        depth_mm = rng.uniform(-100, 15000, size=(32, 32)).astype(np.float32)
        depth_mm[0, 0] = np.nan
        depth_mm[0, 1] = np.inf
        np.save(tmp_path / loc / f"d{i}.npy", depth_mm)
        for side in ("l", "r"):
            np.save(tmp_path / loc / f"{side}{i}.npy",
                    rng.normal(size=4000).astype(np.float32))
        rows.append(f"{loc}/d{i}.npy,{loc}/l{i}.npy,{loc}/r{i}.npy")
    (tmp_path / "train.csv").write_text(
        "depth path,audio path left,audio path right\n" + "\n".join(rows) + "\n"
    )
    return tmp_path


def test_bv1_sample_semantics(bv1_root):
    cfg = load_config("batvisionv1", overrides={
        "dataset.dataset_dir": str(bv1_root), "dataset.images_size": 32,
    })
    ds = BatvisionV1Dataset(cfg, "train.csv")
    s = ds.sample(0)
    # depth_norm=True on BV1: normalized to [0,1]; NaN/inf scrubbed to 0
    assert s["depth"].max() <= 1.0 and s["depth"].min() >= 0.0
    assert np.isfinite(s["depth"]).all()
    assert s["waveform"].shape == (2, 4000)


def test_bv1_blacklist(bv1_root):
    cfg = load_config("batvisionv1", overrides={
        "dataset.dataset_dir": str(bv1_root), "dataset.images_size": 32,
    })
    ds = BatvisionV1Dataset(cfg, "train.csv", location_blacklist=["seqA"])
    assert len(ds) == 1


def test_bv1_holdout_clone_shares_wave_len(tmp_path):
    """filter_by_audio_path pins the PARENT's waveform length: with
    variable-length recordings, holdout loaders must batch to the same
    [B,2,L] as the train loader (no retrace, same STFT window)."""
    rng = np.random.default_rng(2)
    rows = []
    for i, (loc, length) in enumerate([("seqA", 4000), ("seqA", 4000),
                                       ("seqB", 3000)]):
        (tmp_path / loc).mkdir(exist_ok=True)
        np.save(tmp_path / loc / f"d{i}.npy",
                rng.uniform(0, 12000, size=(16, 16)).astype(np.float32))
        for side in ("l", "r"):
            np.save(tmp_path / loc / f"{side}{i}.npy",
                    rng.normal(size=length).astype(np.float32))
        rows.append(f"{loc}/d{i}.npy,{loc}/l{i}.npy,{loc}/r{i}.npy")
    (tmp_path / "train.csv").write_text(
        "depth path,audio path left,audio path right\n" + "\n".join(rows) + "\n"
    )
    cfg = load_config("batvisionv1", overrides={
        "dataset.dataset_dir": str(tmp_path), "dataset.images_size": 16,
    })
    ds = BatvisionV1Dataset(cfg, "train.csv")
    holdout = ds.filter_by_audio_path("seqB")  # cloned BEFORE wave_len access
    assert holdout.wave_len == ds.wave_len == 4000
    assert holdout.sample(0)["waveform"].shape == (2, 4000)


def test_holdout_filter_is_literal_not_regex(bv2_root):
    """Location names with regex metacharacters must match literally."""
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": 32,
    })
    from audiodepth_tpu.data.batvision import BatvisionV2Dataset

    ds = BatvisionV2Dataset(cfg, "train.csv")
    # '(1)' would raise re.error with regex=True if unbalanced, and '.'
    # would over-match; a literal non-matching pattern returns 0 rows
    assert len(ds.filter_by_audio_path("room(1)")) == 0
    assert len(ds.filter_by_audio_path("n+o(n.e")) == 0


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.uniform(-0.5, 0.5, size=(2, 1000)).astype(np.float32)
    write_wav(tmp_path / "x.wav", data)
    loaded, sr = load_wav(str(tmp_path / "x.wav"))
    assert sr == 44100 and loaded.shape == (2, 1000)
    np.testing.assert_allclose(loaded, data, atol=1e-4)


def test_make_dataset_synthetic():
    cfg = load_config("synthetic", overrides={"dataset.images_size": 64})
    ds = make_dataset(cfg, "val")
    assert len(ds) == 64


def test_bv2_paired_audio_and_image(bv2_root):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(bv2_root), "dataset.images_size": 64,
    })
    # camera files don't exist in the fixture; create gray PNGs
    import cv2
    for loc in ("Hall", "Office"):
        (bv2_root / loc / "cam").mkdir(exist_ok=True)
        for i in range(3):
            cv2.imwrite(str(bv2_root / loc / "cam" / f"c{i}.png"),
                        np.full((48, 64, 3), 128, np.uint8))
    ds = BatvisionV2Dataset(cfg, "train.csv", use_image="both")
    s = ds.sample(0)
    assert "waveform" in s and "image" in s and "depth" in s
    assert s["image"].shape == (64, 64, 3)
