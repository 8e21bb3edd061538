"""Sparse/coarse-depth dataset (+ binned variant) over BatvisionV2 layout.

Twin of dataloader/SparseDepth_Dataset.py in the reference: per-location
scan requiring BOTH the annotation CSV and a `sparse_depth_{method}/`
folder produced by tools/preprocess_sparse_depth.py (:56-80); depth targets
load from that folder (same mm→m/clip/nearest-resize semantics as BV2);
audio is identical to the BV2 pipeline; optionally the original depth is
returned alongside for comparison (:136-145).

BinnedDepthDataset semantics (bin edges + bucketize) live in data/bins.py;
`batches()` attaches int 'bins' targets when n_bins is set.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ..configs import Config
from ..ops.resize import resize_bilinear_np
from .batvision import _batch_iter, _fix_length, load_wav
from .bins import compute_bin_edges, depth_to_bins_np
from .frontend import tof_cut_samples


def _load_sparse_depth(path: str, size: int, max_depth: float) -> np.ndarray:
    """mm→m, clip, BILINEAR-antialias resize (torchvision Resize semantics).

    Unlike the BV1/BV2 ground-truth path (cv2 INTER_NEAREST), the reference
    resizes sparse targets through get_transform(convert=True) → torchvision
    transforms.Resize (SparseDepth_Dataset.py:129-133), i.e. antialiased
    bilinear. NaN→0 / ±inf→clip-range first (defensive; the reference leaves
    them, which would poison training)."""
    depth = np.load(path).astype(np.float32)
    depth = np.nan_to_num(depth)
    depth = depth / 1000.0
    if max_depth:
        depth[depth > max_depth] = max_depth
    depth[depth < 0] = 0.0
    return resize_bilinear_np(depth, size, size)


class SparseDepthDataset:
    def __init__(
        self,
        cfg: Config,
        annotation_file: str,
        sparse_depth_method: str = "downup_015",
        use_original_depth: bool = False,
        location_blacklist: Optional[Sequence[str]] = None,
    ):
        import pandas as pd

        self.cfg = cfg
        ds = cfg.dataset
        self.root = ds.dataset_dir
        self.method = sparse_depth_method
        self.folder = f"sparse_depth_{sparse_depth_method}"
        self.use_original_depth = use_original_depth
        self.wave_len = tof_cut_samples(ds.max_depth, ds.sample_rate)

        locations = [
            d for d in sorted(os.listdir(self.root))
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith((".", "__")) and not d.endswith("_unzipped")
        ]
        if location_blacklist:
            locations = [l for l in locations if l not in location_blacklist]
        frames = []
        for loc in locations:
            csv_path = os.path.join(self.root, loc, annotation_file)
            sparse_dir = os.path.join(self.root, loc, self.folder)
            if os.path.exists(csv_path) and os.path.exists(sparse_dir):
                df = pd.read_csv(csv_path)
                df["location"] = loc
                frames.append(df)
            elif not os.path.exists(sparse_dir):
                print(f"Warning: {sparse_dir} not found, skipping {loc}")
            else:
                print(f"Warning: {csv_path} not found, skipping {loc}")
        if not frames:
            raise ValueError(
                f"No valid locations with {self.folder} in {self.root}"
            )
        self.instances = pd.concat(frames).reset_index(drop=True)

    def __len__(self):
        return len(self.instances)

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.instances.iloc[idx]
        ds = self.cfg.dataset
        sparse_path = os.path.join(
            self.root, row["location"], self.folder, row["depth file name"]
        )
        sparse = _load_sparse_depth(sparse_path, ds.images_size, ds.max_depth)
        if ds.depth_norm:
            sparse = sparse / ds.max_depth
        out = {"depth": sparse[..., None]}
        if self.use_original_depth:
            orig = _load_sparse_depth(
                os.path.join(self.root, row["depth path"], row["depth file name"]),
                ds.images_size, ds.max_depth,
            )
            if ds.depth_norm:
                orig = orig / ds.max_depth
            out["original_depth"] = orig[..., None]
        wav, _ = load_wav(
            os.path.join(self.root, row["audio path"], row["audio file name"])
        )
        out["waveform"] = _fix_length(wav, self.wave_len)
        return out

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        yield from _batch_iter(self, batch_size, shuffle, seed, drop_last)


class BinnedSparseDepthDataset(SparseDepthDataset):
    """Adds bucketized 'bins' targets (BinnedDepthDataset twin)."""

    def __init__(self, *args, n_bins: int = 128, bin_mode: str = "linear",
                 sid_alpha: float = 0.6, depth_min: float = 0.1,
                 depth_max: Optional[float] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_bins = n_bins
        self.bin_edges, self.bin_centers = compute_bin_edges(
            n_bins, depth_min, depth_max or self.cfg.dataset.max_depth,
            bin_mode, sid_alpha,
        )

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        out = super().sample(idx)
        depth_m = out["depth"][..., 0]
        if self.cfg.dataset.depth_norm:
            depth_m = depth_m * self.cfg.dataset.max_depth
        out["bins"] = depth_to_bins_np(depth_m, self.bin_edges)
        return out
