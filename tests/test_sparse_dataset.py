"""SparseDepthDataset over a fabricated BV2-layout corpus with sparse folders."""

import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.sparse_depth import BinnedSparseDepthDataset, SparseDepthDataset
from tests.test_batvision_data import write_wav


@pytest.fixture
def sparse_root(tmp_path):
    rng = np.random.default_rng(0)
    for loc in ("Hall", "NoSparse"):
        d = tmp_path / loc
        (d / "audio").mkdir(parents=True)
        (d / "depth").mkdir()
        if loc == "Hall":
            (d / "sparse_depth_downup_015").mkdir()
        rows = []
        for i in range(3):
            depth_mm = rng.uniform(0, 40000, size=(48, 64)).astype(np.float32)
            np.save(d / "depth" / f"depth_{i}.npy", depth_mm)
            if loc == "Hall":
                np.save(d / "sparse_depth_downup_015" / f"depth_{i}.npy",
                        depth_mm * 0.9)
            write_wav(d / "audio" / f"a{i}.wav",
                      rng.normal(0, 0.1, size=(2, 9000)).astype(np.float32))
            rows.append(f"{loc}/audio,a{i}.wav,{loc}/depth,depth_{i}.npy")
        (d / "train.csv").write_text(
            "audio path,audio file name,depth path,depth file name\n"
            + "\n".join(rows) + "\n"
        )
    return tmp_path


def test_sparse_scan_requires_folder(sparse_root, capsys):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(sparse_root), "dataset.images_size": 64,
    })
    ds = SparseDepthDataset(cfg, "train.csv")
    assert len(ds) == 3  # NoSparse skipped
    assert "sparse_depth_downup_015 not found" in capsys.readouterr().out


def test_sparse_sample_with_original(sparse_root):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(sparse_root), "dataset.images_size": 64,
    })
    ds = SparseDepthDataset(cfg, "train.csv", use_original_depth=True)
    s = ds.sample(0)
    assert s["depth"].shape == (64, 64, 1)
    assert s["original_depth"].shape == (64, 64, 1)
    assert s["waveform"].shape[0] == 2


def test_binned_sparse(sparse_root):
    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(sparse_root), "dataset.images_size": 64,
    })
    ds = BinnedSparseDepthDataset(cfg, "train.csv", n_bins=16, bin_mode="sid")
    s = ds.sample(0)
    assert s["bins"].shape == (64, 64)
    assert s["bins"].max() < 16 and s["bins"].min() >= 0
    batch = next(ds.batches(2, shuffle=False))
    assert batch["bins"].shape == (2, 64, 64)
